"""ODS driver tests (ogr/ogrsf_frmts/ods analog)."""

import io
import zipfile

import pyarrow as pa
import pytest

from gdal_ray.sources import vector_formats as VF
from gdal_ray.sources import vector_writers as VW


def _attr_table():
    return pa.table({
        "name": pa.array(["alpha", "b <&> c", None, "delta"]),
        "count": pa.array([3, None, 12, -7], pa.int64()),
        "score": pa.array([1.5, 2.25, None, -0.125], pa.float64()),
        "flag": pa.array([True, False, None, True], pa.bool_()),
    })


def test_ods_roundtrip_types():
    tab = _attr_table()
    back = VF.parse_ods_bytes(VW.ods_bytes(tab))
    assert back.column_names == tab.column_names
    for c in tab.column_names:
        assert back.column(c).to_pylist() == tab.column(c).to_pylist(), c
    assert back.schema.field("count").type == pa.int64()
    assert back.schema.field("flag").type == pa.bool_()


def test_ods_package_shape():
    blob = VW.ods_bytes(_attr_table())
    zf = zipfile.ZipFile(io.BytesIO(blob))
    infos = zf.infolist()
    # OpenDocument spec: mimetype first, STORED
    assert infos[0].filename == "mimetype"
    assert infos[0].compress_type == zipfile.ZIP_STORED
    assert zf.read("mimetype") == \
        b"application/vnd.oasis.opendocument.spreadsheet"
    assert blob == VW.ods_bytes(_attr_table())        # deterministic


def test_ods_repeated_columns_read():
    content = (
        '<?xml version="1.0"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        '<office:body><office:spreadsheet>'
        '<table:table table:name="s">'
        '<table:table-row>'
        '<table:table-cell office:value-type="string">'
        '<text:p>a</text:p></table:table-cell>'
        '<table:table-cell office:value-type="string">'
        '<text:p>b</text:p></table:table-cell>'
        '<table:table-cell office:value-type="string">'
        '<text:p>c</text:p></table:table-cell>'
        '</table:table-row>'
        '<table:table-row>'
        '<table:table-cell office:value-type="float" office:value="7" '
        'table:number-columns-repeated="3"><text:p>7</text:p>'
        '</table:table-cell></table:table-row>'
        '</table:table></office:spreadsheet></office:body>'
        '</office:document-content>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype",
                    "application/vnd.oasis.opendocument.spreadsheet")
        zf.writestr("content.xml", content)
    t = VF.parse_ods_bytes(buf.getvalue())
    assert t.column_names == ["a", "b", "c"]
    assert t.column("b").to_pylist() == [7]


def test_ods_sheet_selection():
    blob = VW.ods_bytes(_attr_table(), sheet="mydata")
    assert VF.parse_ods_bytes(blob, sheet="mydata").num_rows == 4
    with pytest.raises(ValueError, match="no sheet"):
        VF.parse_ods_bytes(blob, sheet="nope")


def test_ods_sink_readback(tmp_path, ray_session):
    import ray

    man = VW.write_ods(ray.data.from_arrow(_attr_table()),
                       str(tmp_path / "ods")).to_pandas()
    back = VF.read_ods(sorted(man["path"])).to_pandas()
    assert sorted(back["count"].dropna()) == [-7, 3, 12]


def test_ods_trailing_repeated_empty_padding():
    """LibreOffice pads rows with number-columns-repeated empty cells;
    a 1-column sheet must NOT explode into thousands of FieldN
    columns."""
    content = (
        '<?xml version="1.0"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        '<office:body><office:spreadsheet><table:table table:name="s">'
        '<table:table-row>'
        '<table:table-cell office:value-type="string">'
        '<text:p>only</text:p></table:table-cell>'
        '<table:table-cell table:number-columns-repeated="16383"/>'
        '</table:table-row>'
        '<table:table-row>'
        '<table:table-cell office:value-type="float" office:value="5">'
        '<text:p>5</text:p></table:table-cell>'
        '<table:table-cell table:number-columns-repeated="16383"/>'
        '</table:table-row>'
        '</table:table></office:spreadsheet></office:body>'
        '</office:document-content>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype",
                    "application/vnd.oasis.opendocument.spreadsheet")
        zf.writestr("content.xml", content)
    t = VF.parse_ods_bytes(buf.getvalue())
    assert t.column_names == ["only"]
    assert t.column("only").to_pylist() == [5]
