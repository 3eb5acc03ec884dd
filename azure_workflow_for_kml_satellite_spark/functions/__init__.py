"""Pure-Python/numpy kernels shared by the Spark pandas UDFs and the
sequential oracle. No Spark imports here — keeps them picklable and testable.
"""
