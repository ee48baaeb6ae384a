"""EXIF extraction (r18): TIFF-IFD grammar in both byte orders, all
four containers (JPEG APP1, bare TIFF, WebP EXIF chunk, PNG eXIf),
rational micro-unit exactness, absence-as-data, byte-flip fuzz."""

from __future__ import annotations

import random
import struct

import pytest

from postgres_debezium_clickhouse_spark.operators.exif import (
    exif_encode_tiff,
    exif_walk,
    exif_wrap,
)


def _full_tiff(le: bool) -> bytes:
    return exif_encode_tiff(
        make="maker 1", model="cam 2", orientation=6, iso=400,
        f_number=(28, 10), exposure=(1, 125), focal=(50, 1),
        pixel_xy=(4000, 3000), dt_original="2021:06:15 12:00:01",
        gps=True, little_endian=le)


@pytest.mark.parametrize("le", [True, False])
@pytest.mark.parametrize("container", ["jpeg", "tiff", "webp", "png"])
def test_all_containers_both_orders(le, container):
    blob = exif_wrap(container, _full_tiff(le))
    m = exif_walk(blob)
    assert m["container"] == container
    assert m["has_exif"] is True
    assert m["make"] == "maker 1" and m["model"] == "cam 2"
    assert m["orientation"] == 6
    assert m["iso"] == 400
    assert m["f_number_x100"] == 280          # 28/10 → 2.80
    assert m["exposure_us"] == 8000           # 1/125 s
    assert m["focal_mm_x10"] == 500
    assert (m["pixel_x"], m["pixel_y"]) == (4000, 3000)
    assert m["datetime_original"] == "2021:06:15 12:00:01"
    assert m["gps_present"] is True


@pytest.mark.parametrize("container", ["jpeg", "webp", "png"])
def test_absence_is_data_not_error(container):
    m = exif_walk(exif_wrap(container, None))
    assert m["container"] == container
    assert m["has_exif"] is False
    assert m["make"] is None and m["gps_present"] is None


def test_partial_ifd0_only():
    t = exif_encode_tiff(make="m", orientation=3, little_endian=False)
    m = exif_walk(t)
    assert m["make"] == "m" and m["orientation"] == 3
    assert m["iso"] is None and m["exposure_us"] is None
    assert m["gps_present"] is False


def test_rational_zero_denominator_is_null_not_crash():
    t = exif_encode_tiff(exposure=(1, 0), little_endian=True)
    assert exif_walk(t)["exposure_us"] is None


def test_deadletter_classes():
    with pytest.raises(ValueError, match="no EXIF-bearing container"):
        exif_walk(b"\x00" * 16)
    with pytest.raises(ValueError, match="byte-order"):
        exif_walk(exif_wrap("jpeg", b"XX" + bytes(8))[0:2]
                  + exif_wrap("jpeg", b"XX\x00\x2a" + bytes(6))[2:])
    # IFD offset past the blob
    bad = bytearray(_full_tiff(True))
    bad[4:8] = struct.pack("<I", len(bad) + 100)
    with pytest.raises(ValueError):
        exif_walk(bytes(bad))


def test_fuzz_never_wrong_only_deadletter():
    rng = random.Random(318)
    blobs = [exif_wrap(c, _full_tiff(le))
             for c in ("jpeg", "tiff", "webp", "png")
             for le in (True, False)]
    for b in blobs:
        base = exif_walk(b)
        for _ in range(600):
            bb = bytearray(b)
            for _f in range(rng.randint(1, 3)):
                bb[rng.randrange(len(bb))] = rng.randrange(256)
            try:
                exif_walk(bytes(bb))
            except (ValueError, NotImplementedError):
                pass
        for cut in range(1, len(b), 9):
            try:
                exif_walk(b[:cut])
            except (ValueError, NotImplementedError):
                pass
        assert exif_walk(b) == base


def test_spark_plumbing_and_closed_form(spark):
    from postgres_debezium_clickhouse_spark.operators.exif import (
        exif_metadata, synth_exif_docs)

    ids = spark.range(0, 80, 1, 4).withColumnRenamed("id", "doc_id")
    out = exif_metadata(synth_exif_docs(ids)).collect()
    assert len(out) == 80
    for r in out:
        d = r["doc_id"]
        container = ["jpeg", "tiff", "webp", "png"][d % 4]
        assert r["container"] == container
        if d % 7 == 0 and container != "tiff":
            assert r["has_exif"] is False and r["make"] is None
            continue
        assert r["has_exif"] is True
        assert r["make"] == f"maker {d % 3}"
        assert r["orientation"] == 1 + d % 8
        assert r["iso"] == 100 * (1 + d % 32)
        assert r["f_number_x100"] == (14 + d % 9) * 100 // 5
        assert r["exposure_us"] == 1_000_000 // (25 * (1 + d % 6))
        assert r["focal_mm_x10"] == (35 + d % 11) * 10 // 2
        assert r["pixel_x"] == 64 * (1 + d % 5)
        assert r["gps_present"] == (d % 3 == 0)
