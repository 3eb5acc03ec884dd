"""Independent PDF 1.4 renderer for the sequential oracle (S20).

A fresh straight-line transcription of the deterministic byte-layout
contract documented in functions/pdf.py (A4 geometry, y-cursor rules,
Helvetica standard-14 fonts, uncompressed content streams, sequential
object numbering, xref format) and of the report rendering sequence in
operators/reports._render_report (reference: blueprints/export.py:512-1533).
Zero code sharing with the engine modules — a layout bug on either side now
fails the ``pdf_md5`` gate instead of silently passing both."""

from __future__ import annotations

_PAGE_W = 595.28
_PAGE_H = 841.89
_M = 40.0


def _escape(s: str) -> str:
    t = s.encode("latin-1", "replace").decode("latin-1")
    out = []
    for ch in t:
        if ch == "\\":
            out.append("\\\\")
        elif ch == "(":
            out.append("\\(")
        elif ch == ")":
            out.append("\\)")
        else:
            out.append(ch)
    return "".join(out)


class _Doc:
    def __init__(self):
        self.pages = [[]]
        self.y = _PAGE_H - _M

    def _break_if_needed(self, need: float) -> None:
        if self.y - need < _M:
            self.pages.append([])
            self.y = _PAGE_H - _M

    def _put(self, x: float, size: float, style: str, text: str) -> None:
        fkey = {"": "F1", "B": "F2", "I": "F3"}[style]
        self.pages[-1].append(
            "BT /%s %g Tf %.2f %.2f Td (%s) Tj ET" % (fkey, size, x, self.y, _escape(text))
        )

    def heading(self, text: str, size: float) -> None:
        self._break_if_needed(size + 8)
        self.y = self.y - (size + 4)
        self._put(_M, size, "B", text)
        self.y = self.y - 4

    def line(self, text: str, size: float, style: str = "") -> None:
        self._break_if_needed(size + 3)
        self.y = self.y - (size + 2)
        self._put(_M, size, style, text)

    def table(self, header: list, rows: list, widths: list) -> None:
        for idx, cells in enumerate([header] + rows):
            self._break_if_needed(13.0)
            self.y = self.y - 11.0
            x = _M
            for cell, w in zip(cells, widths):
                self.pages[-1].append(
                    "%.2f %.2f %.2f %.2f re S" % (x, self.y - 3, w, 11.0)
                )
                clip = cell[: max(1, int(w / 4))]
                self._put(x + 2, 7, "B" if idx == 0 else "", clip)
                x = x + w

    def serialize(self) -> bytes:
        bodies: list[bytes] = []
        for fname in ("Helvetica", "Helvetica-Bold", "Helvetica-Oblique"):
            bodies.append(
                ("<< /Type /Font /Subtype /Type1 /BaseFont /%s >>" % fname).encode(
                    "latin-1"
                )
            )
        n_pages = len(self.pages)
        tree_obj = 3 + 2 * n_pages + 1
        page_ids = []
        for ops in self.pages:
            payload = "\n".join(ops).encode("latin-1")
            bodies.append(
                b"<< /Length "
                + str(len(payload)).encode()
                + b" >>\nstream\n"
                + payload
                + b"\nendstream"
            )
            content_obj = len(bodies)
            bodies.append(
                (
                    "<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %g %g] "
                    "/Resources << /Font << /F1 1 0 R /F2 2 0 R /F3 3 0 R >> >> "
                    "/Contents %d 0 R >>" % (tree_obj, _PAGE_W, _PAGE_H, content_obj)
                ).encode("latin-1")
            )
            page_ids.append(len(bodies))
        bodies.append(
            (
                "<< /Type /Pages /Kids [%s] /Count %d >>"
                % (" ".join("%d 0 R" % i for i in page_ids), n_pages)
            ).encode("latin-1")
        )
        root_obj = len(bodies) + 1
        bodies.append(("<< /Type /Catalog /Pages %d 0 R >>" % (root_obj - 1)).encode("latin-1"))

        buf = bytearray(b"%PDF-1.4\n")
        offs = []
        for num, body in enumerate(bodies, start=1):
            offs.append(len(buf))
            buf += ("%d 0 obj\n" % num).encode() + body + b"\nendobj\n"
        xref_pos = len(buf)
        buf += ("xref\n0 %d\n" % (len(bodies) + 1)).encode()
        buf += b"0000000000 65535 f \n"
        for o in offs:
            buf += ("%010d 00000 n \n" % o).encode()
        buf += (
            "trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF"
            % (len(bodies) + 1, root_obj, xref_pos)
        ).encode()
        return bytes(buf)


_TABLE_WIDTHS = [150.0, 70.0, 110.0, 90.0, 70.0]


def render_report(
    head: list,
    trend_lines: list,
    table_header_cells: list,
    table_cells: list,
    parcel_blocks: list,
) -> bytes:
    """The report rendering sequence (operators/reports._render_report):
    title 18 / ids 9 / summary heading 12 + 3×10 / vegetation heading 12 +
    trend 10 / bordered table / evidence heading 14 / per parcel: name
    bold 11, verdict 9, flags italic 9.

    ``head`` is the 8 fixed section lines; ``parcel_blocks`` is
    [(name_line, verdict_line, [flag_lines...]), ...]."""
    d = _Doc()
    d.heading(head[0], 18)
    d.line(head[1], 9)
    d.line(head[2], 9)
    d.heading(head[3], 12)
    d.line(head[4], 10)
    d.line(head[5], 10)
    d.line(head[6], 10)
    d.heading(head[7], 12)
    for t in trend_lines:
        d.line(t, 10)
    d.table(table_header_cells, table_cells, _TABLE_WIDTHS)
    d.heading("Per-Parcel Evidence", 14)
    for name_line, verdict_line, flag_lines in parcel_blocks:
        d.line(name_line, 11, "B")
        d.line(verdict_line, 9)
        for fl in flag_lines:
            d.line(fl, 9, "I")
    return d.serialize()
