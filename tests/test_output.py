import numpy as np

from dynamont_tpu.utils.output import (
    format_segmentation,
    format_segmentation_output,
    parse_segment_string,
    segments_to_string,
)


def test_parse_roundtrip():
    segs = [("M", 2, 0, 1.0), ("M", 3, 2, 0.89565)]
    s = segments_to_string(segs)
    assert s == "M2,0,1.00000;M3,2,0.89565;"
    parsed = parse_segment_string(s)
    assert parsed == [("M", 2, 0, 1.0, None), ("M", 3, 2, 0.89565, None)]


def test_polish_column():
    segs = [("M", 2, 0, 1.0, "ACGTC")]
    assert segments_to_string(segs) == "M2,0,1.00000,ACGTC;"
    assert parse_segment_string("M2,0,1.00000,ACGTC;") == [("M", 2, 0, 1.0, "ACGTC")]


def test_format_segmentation_output_golden_dna():
    # golden string from the reference test suite (ref: test_FileIO.py:59-71)
    output = "M2,0,1.000000;M3,2,1.000000;M4,871,0.895648;"
    read = "AAACCCGGG"
    rows = format_segmentation_output(output, 10, 1000 + 10, read, 5, rna=False)
    assert rows.shape == (3, 8)
    # start/end offsets
    assert list(rows[0][:2]) == [10, 12]
    assert list(rows[1][:2]) == [12, 881]
    assert list(rows[2][:2]) == [881, 1010]
    # basepos/base/motif
    assert rows[0][2] == 2 and rows[0][3] == "A" and rows[0][4] == "AAACC"
    assert rows[2][2] == 4 and rows[2][3] == "C" and rows[2][4] == "ACCCG"
    assert all(r[5] == "M" for r in rows)
    assert rows[2][6] == 0.895648
    assert all(r[7] == "NA" for r in rows)


def test_format_segmentation_output_rna_mirroring():
    output = "M2,0,1.000000;"
    read = "AAACCCGGG"  # processing orientation (3'->5')
    rows = format_segmentation_output(output, 0, 100, read, 5, rna=True)
    # basepos mirrored: len(read) - 2 - 1 = 6; motif reversed
    assert rows[0][2] == 6
    assert rows[0][4] == "CCAAA"
    assert rows[0][3] == "A"


def test_format_segmentation_bytes():
    rows = np.array([[0, 5, 2, "A", "AAACC", "M", 1.0, "NA"]], dtype=object)
    out = format_segmentation("rid", "sid", rows)
    assert out == b"rid,sid,0,5,2,A,AAACC,M,1.0,NA\n"
