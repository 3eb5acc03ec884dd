"""Execution-plan utilities: checkpoint/lineage ledger, skew salting."""
