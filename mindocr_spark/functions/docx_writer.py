"""Minimal OOXML (.docx) writer — layout-recovery document emission.

Closes the long-carried "docx emission" partial (SURVEY §2.1 row 13):
``convert_info_docx`` (``tools/infer/text/utils/recovery_to_doc.py:23-88``)
builds a Word document from sorted layout regions with python-docx; that
library is absent here, but a .docx is just a zip of OOXML parts, so this
module emits the same document structure with stdlib ``zipfile`` + string
XML:

- Normal style Times New Roman 6.5pt (``set_document_styles``,
  recovery_to_doc.py:12-20);
- a CONTINUOUS section break with ``w:cols w:num=N`` whenever the region
  layout changes (single/double/triple -> 1/2/3 columns, :43-56);
- region types: ``title`` -> Heading1 paragraph; ``table`` -> a
  TableGrid ``w:tbl`` parsed from the region's pred_html (the
  ``HtmlToDocx.handle_table`` slot — fed by
  ``functions/table_master.table_master_html``); ``figure`` -> an inline
  embedded PNG sized 5/2.5/1.5 inches by current column count (:59-70);
  anything else -> a 10pt text paragraph (:80-83);
- empty-res regions skipped (:40-41).

The output is standard WordprocessingML: parseable by python-docx/Word;
tests verify structure by unzipping and walking the XML with
ElementTree (tests/test_docx_writer.py).
"""

from __future__ import annotations

import re
import zipfile
from xml.sax.saxutils import escape

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
R_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
WP_NS = (
    "http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing"
)
A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"
PIC_NS = "http://schemas.openxmlformats.org/drawingml/2006/picture"

EMU_PER_INCH = 914400

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Default Extension="png" ContentType="image/png"/>
<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
<Override PartName="/word/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.styles+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
</Relationships>"""

# Normal = Times New Roman 6.5pt (13 half-points) with the east-Asian font
# override, exactly set_document_styles; Heading1 for doc.add_heading.
_STYLES = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:styles xmlns:w="{W_NS}">
<w:style w:type="paragraph" w:default="1" w:styleId="Normal">
<w:name w:val="Normal"/>
<w:rPr><w:rFonts w:ascii="Times New Roman" w:hAnsi="Times New Roman" w:eastAsia="SimSun"/><w:sz w:val="13"/></w:rPr>
</w:style>
<w:style w:type="paragraph" w:styleId="Heading1">
<w:name w:val="heading 1"/><w:basedOn w:val="Normal"/>
<w:pPr><w:outlineLvl w:val="0"/></w:pPr>
<w:rPr><w:b/><w:sz w:val="32"/></w:rPr>
</w:style>
<w:style w:type="table" w:styleId="TableGrid">
<w:name w:val="Table Grid"/>
<w:tblPr><w:tblBorders>
<w:top w:val="single" w:sz="4" w:color="000000"/>
<w:left w:val="single" w:sz="4" w:color="000000"/>
<w:bottom w:val="single" w:sz="4" w:color="000000"/>
<w:right w:val="single" w:sz="4" w:color="000000"/>
<w:insideH w:val="single" w:sz="4" w:color="000000"/>
<w:insideV w:val="single" w:sz="4" w:color="000000"/>
</w:tblBorders></w:tblPr>
</w:style>
</w:styles>"""

_LAYOUT_COLS = {"single": 1, "double": 2, "triple": 3}
_FIGURE_INCHES = {1: 5.0, 2: 2.5, 3: 1.5}


def _text_par(text: str, size_halfpt: int | None = 20,
              style: str | None = None) -> str:
    rpr = f"<w:rPr><w:sz w:val=\"{size_halfpt}\"/></w:rPr>" if size_halfpt else ""
    ppr = f"<w:pPr><w:pStyle w:val=\"{style}\"/></w:pPr>" if style else ""
    return (
        f"<w:p>{ppr}<w:r>{rpr}"
        f"<w:t xml:space=\"preserve\">{escape(text)}</w:t></w:r></w:p>"
    )


def _section_break(n_cols: int) -> str:
    """A CONTINUOUS section break carrying the column count — emitted as
    its own paragraph's sectPr, which in WordprocessingML ends the
    preceding section (the doc.add_section(WD_SECTION.CONTINUOUS)
    analogue)."""
    return (
        "<w:p><w:pPr><w:sectPr>"
        f"<w:type w:val=\"continuous\"/><w:cols w:num=\"{n_cols}\"/>"
        "</w:sectPr></w:pPr></w:p>"
    )


_TR_RE = re.compile(r"<tr>(.*?)</tr>", re.S)
_TD_RE = re.compile(
    r"<td(?: rowspan=\"(\d+)\")?(?: colspan=\"(\d+)\")?"
    r"(?: rowspan=\"(\d+)\")?>(.*?)</td>",
    re.S,
)
_TAG_RE = re.compile(r"<[^>]+>")


def _table_xml(pred_html: str) -> str:
    """pred_html (table_master_html output) -> w:tbl with TableGrid style
    — the HtmlToDocx.handle_table slot. colspan becomes gridSpan; inner
    markup (<b>, <i>, ...) is flattened to its text (python-docx's parser
    maps it to run formatting; text content is what the goldens pin)."""
    rows = []
    for row_html in _TR_RE.findall(pred_html):
        cells = []
        for m in _TD_RE.finditer(row_html):
            colspan = int(m.group(2) or 1)
            text = _TAG_RE.sub("", m.group(4))
            span_xml = (
                f"<w:tcPr><w:gridSpan w:val=\"{colspan}\"/></w:tcPr>"
                if colspan > 1
                else ""
            )
            cells.append(
                f"<w:tc>{span_xml}"
                f"<w:p><w:r><w:t xml:space=\"preserve\">"
                f"{escape(text)}</w:t></w:r></w:p></w:tc>"
            )
        if cells:
            rows.append(f"<w:tr>{''.join(cells)}</w:tr>")
    return (
        "<w:tbl><w:tblPr><w:tblStyle w:val=\"TableGrid\"/></w:tblPr>"
        + "".join(rows)
        + "</w:tbl>"
    )


def _png_dims(png: bytes) -> tuple[int, int]:
    if png[:8] != b"\x89PNG\r\n\x1a\n" or png[12:16] != b"IHDR":
        raise ValueError("not a PNG payload")
    return (
        int.from_bytes(png[16:20], "big"),
        int.from_bytes(png[20:24], "big"),
    )


def _figure_xml(rid: str, img_id: int, png: bytes, width_in: float) -> str:
    """Centered paragraph with an inline picture scaled to width_in,
    height preserving the PNG's aspect ratio (run.add_picture(width=...)
    semantics)."""
    w_px, h_px = _png_dims(png)
    cx = int(width_in * EMU_PER_INCH)
    cy = int(cx * h_px / max(w_px, 1))
    return (
        "<w:p><w:pPr><w:jc w:val=\"center\"/></w:pPr><w:r><w:drawing>"
        f"<wp:inline xmlns:wp=\"{WP_NS}\">"
        f"<wp:extent cx=\"{cx}\" cy=\"{cy}\"/>"
        f"<wp:docPr id=\"{img_id}\" name=\"figure{img_id}\"/>"
        f"<a:graphic xmlns:a=\"{A_NS}\">"
        f"<a:graphicData uri=\"{PIC_NS}\">"
        f"<pic:pic xmlns:pic=\"{PIC_NS}\">"
        f"<pic:nvPicPr><pic:cNvPr id=\"{img_id}\" name=\"figure{img_id}\"/>"
        "<pic:cNvPicPr/></pic:nvPicPr>"
        f"<pic:blipFill><a:blip xmlns:r=\"{R_NS}\" r:embed=\"{rid}\"/>"
        "<a:stretch><a:fillRect/></a:stretch></pic:blipFill>"
        "<pic:spPr><a:xfrm><a:off x=\"0\" y=\"0\"/>"
        f"<a:ext cx=\"{cx}\" cy=\"{cy}\"/></a:xfrm>"
        "<a:prstGeom prst=\"rect\"><a:avLst/></a:prstGeom></pic:spPr>"
        "</pic:pic></a:graphicData></a:graphic></wp:inline>"
        "</w:drawing></w:r></w:p>"
    )


def convert_info_docx(regions: list[dict], out_path: str) -> None:
    """Layout regions -> .docx, mirroring recovery_to_doc.convert_info_docx.

    Each region: ``{"type": "text"|"title"|"table"|"figure",
    "res": str | bytes, "layout": "single"|"double"|"triple"}`` — for
    figures ``res`` is the PNG payload bytes (the reference passes an
    image path; this engine's media are in-memory payloads), for tables
    the pred_html string, otherwise the region text."""
    body: list[str] = []
    images: list[bytes] = []
    rels: list[str] = []
    flag = 1
    previous_layout = None
    for region in regions:
        if not region.get("res"):
            continue
        layout = region.get("layout", "single")
        if layout != previous_layout:
            n = _LAYOUT_COLS.get(layout, 1)
            body.append(_section_break(n))
            flag = n
            previous_layout = layout
        rtype = str(region.get("type", "text")).lower()
        if rtype == "figure":
            png = bytes(region["res"])
            rid = f"rIdImg{len(images) + 1}"
            body.append(
                _figure_xml(rid, len(images) + 1, png, _FIGURE_INCHES[flag])
            )
            rels.append(
                f"<Relationship Id=\"{rid}\" "
                f"Type=\"{R_NS}/image\" "
                f"Target=\"media/image{len(images) + 1}.png\"/>"
            )
            images.append(png)
        elif rtype == "title":
            body.append(_text_par(str(region["res"]), None, style="Heading1"))
        elif rtype == "table":
            body.append(_table_xml(str(region["res"])))
        else:
            body.append(_text_par(str(region["res"]), 20))
    document = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
        f"<w:document xmlns:w=\"{W_NS}\"><w:body>"
        + "".join(body)
        + "<w:sectPr><w:cols w:num=\"1\"/></w:sectPr>"
        "</w:body></w:document>"
    )
    doc_rels = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/package"
        "/2006/relationships\">"
        f"<Relationship Id=\"rIdStyles\" Type=\"{R_NS}/styles\" "
        "Target=\"styles.xml\"/>" + "".join(rels) + "</Relationships>"
    )
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("word/document.xml", document)
        zf.writestr("word/_rels/document.xml.rels", doc_rels)
        zf.writestr("word/styles.xml", _STYLES)
        for i, png in enumerate(images):
            zf.writestr(f"word/media/image{i + 1}.png", png)
