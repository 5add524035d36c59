"""Structure tests for the stdlib OOXML writer (recovery_to_doc parity):
unzip the emitted .docx and walk the WordprocessingML with ElementTree."""

import zipfile
import xml.etree.ElementTree as ET

from mindocr_spark.functions.docx_writer import W_NS, convert_info_docx

W = f"{{{W_NS}}}"


def _document(path):
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        doc = ET.fromstring(zf.read("word/document.xml"))
        ET.fromstring(zf.read("word/styles.xml"))  # well-formed
        ET.fromstring(zf.read("[Content_Types].xml"))
        rels = ET.fromstring(zf.read("word/_rels/document.xml.rels"))
    return doc, rels, names


def _texts(doc):
    return [t.text or "" for t in doc.iter(f"{W}t")]


def test_text_title_order_and_styles(tmp_path):
    out = str(tmp_path / "doc.docx")
    convert_info_docx(
        [
            {"type": "title", "res": "Heading", "layout": "single"},
            {"type": "text", "res": "first paragraph", "layout": "single"},
            {"type": "text", "res": "", "layout": "single"},  # skipped
            {"type": "text", "res": "second", "layout": "single"},
        ],
        out,
    )
    doc, _, _ = _document(out)
    assert _texts(doc) == ["Heading", "first paragraph", "second"]
    # heading style + 10pt body runs (sz is half-points)
    styles = [
        ps.get(f"{W}val")
        for ps in doc.iter(f"{W}pStyle")
    ]
    assert styles == ["Heading1"]
    sizes = [s.get(f"{W}val") for s in doc.iter(f"{W}sz")]
    assert sizes == ["20", "20"]


def test_layout_changes_emit_continuous_sections(tmp_path):
    out = str(tmp_path / "doc.docx")
    convert_info_docx(
        [
            {"type": "text", "res": "a", "layout": "single"},
            {"type": "text", "res": "b", "layout": "double"},
            {"type": "text", "res": "c", "layout": "double"},  # no new section
            {"type": "text", "res": "d", "layout": "triple"},
        ],
        out,
    )
    doc, _, _ = _document(out)
    cols = [c.get(f"{W}num") for c in doc.iter(f"{W}cols")]
    # three layout changes + the final body sectPr
    assert cols == ["1", "2", "3", "1"]
    types = [t.get(f"{W}val") for t in doc.iter(f"{W}type")]
    assert types == ["continuous"] * 3


def test_table_region_from_pred_html(tmp_path):
    from mindocr_spark.functions.table_master import (
        grid_structure_tokens,
        table_master_html,
    )
    import numpy as np

    masters = np.array(
        [[0, 0, 10, 10], [10, 0, 20, 10],
         [0, 10, 10, 20], [10, 10, 20, 20]], dtype=float
    )
    boxes = np.array(
        [[1, 1, 9, 9], [11, 1, 19, 9], [1, 11, 9, 19], [11, 11, 19, 19]],
        dtype=float,
    )
    html = table_master_html(
        grid_structure_tokens(2, 2), masters, boxes, ["h1", "h2", "a", "b"]
    )
    out = str(tmp_path / "doc.docx")
    convert_info_docx([{"type": "table", "res": html, "layout": "single"}], out)
    doc, _, _ = _document(out)
    tbl = list(doc.iter(f"{W}tbl"))
    assert len(tbl) == 1
    rows = list(tbl[0].iter(f"{W}tr"))
    assert len(rows) == 2
    cell_texts = [
        "".join(t.text or "" for t in tc.iter(f"{W}t"))
        for tr in rows
        for tc in tr.iter(f"{W}tc")
    ]
    # <b> markup flattened to text content; order row-major
    assert cell_texts == ["h1", "h2", "a", "b"]
    style = next(doc.iter(f"{W}tblStyle"))
    assert style.get(f"{W}val") == "TableGrid"


def test_table_colspan_becomes_gridspan(tmp_path):
    html = ('<table><thead><tr><td colspan="2">W</td></tr></thead>'
            "<tbody><tr><td>a</td><td>b</td></tr></tbody></table>")
    out = str(tmp_path / "doc.docx")
    convert_info_docx([{"type": "table", "res": html, "layout": "single"}], out)
    doc, _, _ = _document(out)
    spans = [g.get(f"{W}val") for g in doc.iter(f"{W}gridSpan")]
    assert spans == ["2"]


def test_figure_embeds_png_with_column_width(tmp_path):
    import numpy as np

    from mindocr_spark.functions.png_codec import encode_png

    img = np.full((64, 128), 200, dtype=np.uint8)
    png = encode_png(img)
    out = str(tmp_path / "doc.docx")
    convert_info_docx(
        [
            {"type": "figure", "res": png, "layout": "double"},
        ],
        out,
    )
    doc, rels, names = _document(out)
    assert "word/media/image1.png" in names
    with zipfile.ZipFile(out) as zf:
        assert zf.read("word/media/image1.png") == png
    # relationship resolves
    targets = {r.get("Id"): r.get("Target") for r in rels}
    assert targets["rIdImg1"] == "media/image1.png"
    # 2-column layout -> 2.5in wide, aspect preserved (64/128 = 0.5)
    WP = "{http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing}"
    ext = next(doc.iter(f"{WP}extent"))
    cx, cy = int(ext.get("cx")), int(ext.get("cy"))
    assert cx == int(2.5 * 914400)
    assert cy == cx // 2


def test_recover_page_docx_orders_and_sections(tmp_path):
    """End-to-end: typed layout regions -> sorted_layout_boxes ordering ->
    docx bytes; double-column pages produce 2-col sections and column-major
    reading order."""
    import zipfile
    import xml.etree.ElementTree as ET

    from mindocr_spark.functions.layout import recover_page_docx

    regions = [
        {"bbox": [60, 10, 440, 40], "type": "title", "res": "T"},
        {"bbox": [10, 60, 230, 90], "type": "text", "res": "left1"},
        {"bbox": [260, 60, 480, 90], "type": "text", "res": "right1"},
        {"bbox": [10, 100, 230, 130], "type": "text", "res": "left2"},
    ]
    payload = recover_page_docx(regions, page_width=500)
    out = tmp_path / "page.docx"
    out.write_bytes(payload)
    with zipfile.ZipFile(out) as zf:
        doc = ET.fromstring(zf.read("word/document.xml"))
    texts = [t.text for t in doc.iter(f"{W}t")]
    # column-major: full-width title first, then left column, then right
    assert texts == ["T", "left1", "left2", "right1"]
    cols = [c.get(f"{W}num") for c in doc.iter(f"{W}cols")]
    assert "2" in cols
