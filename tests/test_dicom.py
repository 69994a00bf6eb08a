"""Built-in DICOM parser (data/dicom.py): synthesized-fixture tests for
the ISIC-2020 archive path (reference: jgi_isic_2020_torch.ipynb
DicomDataset) — explicit/implicit VR little endian, native mono16 and
RGB pixel data, MONOCHROME1 inversion, and encapsulated-JPEG frames."""

import io
import struct

import numpy as np
import pytest

from skin_image_analysis_tpu.data.dicom import (
    DicomFolder,
    DicomParseError,
    parse_dicom,
    read_dicom_image,
)

_SHORT_VRS = {b"US", b"UI", b"CS", b"DS", b"IS", b"UL"}


def _el_explicit(group, elem, vr, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00" if vr in (b"OB", b"UI") else b" "
    head = struct.pack("<HH", group, elem) + vr
    if vr in _SHORT_VRS:
        return head + struct.pack("<H", len(value)) + value
    return head + b"\x00\x00" + struct.pack("<I", len(value)) + value


def _el_implicit(group, elem, value: bytes) -> bytes:
    if len(value) % 2:
        value += b" "
    return struct.pack("<HHI", group, elem, len(value)) + value


def _meta(transfer_syntax: str) -> bytes:
    ts = _el_explicit(0x0002, 0x0010, b"UI", transfer_syntax.encode())
    group_len = _el_explicit(0x0002, 0x0000, b"UL", struct.pack("<I", len(ts)))
    return b"\x00" * 128 + b"DICM" + group_len + ts


def _us(v):
    return struct.pack("<H", v)


def make_explicit_mono16(arr: np.ndarray, photometric=b"MONOCHROME2") -> bytes:
    rows, cols = arr.shape
    body = b"".join([
        _el_explicit(0x0028, 0x0002, b"US", _us(1)),
        _el_explicit(0x0028, 0x0004, b"CS", photometric),
        _el_explicit(0x0028, 0x0008, b"IS", b"1"),
        _el_explicit(0x0028, 0x0010, b"US", _us(rows)),
        _el_explicit(0x0028, 0x0011, b"US", _us(cols)),
        _el_explicit(0x0028, 0x0100, b"US", _us(16)),
        _el_explicit(0x0028, 0x0103, b"US", _us(0)),
        _el_explicit(0x0028, 0x1052, b"DS", b"0"),
        _el_explicit(0x0028, 0x1053, b"DS", b"1"),
        _el_explicit(0x7FE0, 0x0010, b"OW", arr.astype("<u2").tobytes()),
    ])
    return _meta("1.2.840.10008.1.2.1") + body


def make_implicit_rgb(arr: np.ndarray) -> bytes:
    rows, cols, _ = arr.shape
    body = b"".join([
        _el_implicit(0x0028, 0x0002, _us(3)),
        _el_implicit(0x0028, 0x0004, b"RGB "),
        _el_implicit(0x0028, 0x0006, _us(0)),
        _el_implicit(0x0028, 0x0010, _us(rows)),
        _el_implicit(0x0028, 0x0011, _us(cols)),
        _el_implicit(0x0028, 0x0100, _us(8)),
        _el_implicit(0x0028, 0x0103, _us(0)),
        _el_implicit(0x7FE0, 0x0010, arr.astype(np.uint8).tobytes()),
    ])
    return _meta("1.2.840.10008.1.2") + body


def make_encapsulated_jpeg(arr: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    frag = buf.getvalue()
    if len(frag) % 2:
        frag += b"\x00"
    rows, cols, _ = arr.shape
    pixel = (
        struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00"
        + struct.pack("<I", 0xFFFFFFFF)
        + struct.pack("<HHI", 0xFFFE, 0xE000, 0)            # empty BOT
        + struct.pack("<HHI", 0xFFFE, 0xE000, len(frag)) + frag
        + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    )
    body = b"".join([
        _el_explicit(0x0028, 0x0002, b"US", _us(3)),
        _el_explicit(0x0028, 0x0004, b"CS", b"YBR_FULL_422"),
        _el_explicit(0x0028, 0x0010, b"US", _us(rows)),
        _el_explicit(0x0028, 0x0011, b"US", _us(cols)),
        _el_explicit(0x0028, 0x0100, b"US", _us(8)),
        pixel,
    ])
    return _meta("1.2.840.10008.1.2.4.50") + body


def test_explicit_mono16_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    arr = (rng.random((32, 40)) * 4000).astype(np.uint16)
    path = tmp_path / "m.dcm"
    path.write_bytes(make_explicit_mono16(arr))
    out = read_dicom_image(str(path))
    assert out.shape == (32, 40, 3) and out.dtype == np.uint8
    # grayscale replicated across channels, min->0 max->255 windowing
    assert np.array_equal(out[..., 0], out[..., 1])
    assert out.min() == 0 and out.max() == 255
    # monotone mapping: argmax/argmin of the raw frame survive windowing
    assert out[..., 0].flat[arr.argmax()] == 255
    assert out[..., 0].flat[arr.argmin()] == 0


def test_monochrome1_inverts(tmp_path):
    arr = np.array([[0, 1000], [2000, 4000]], np.uint16)
    path = tmp_path / "inv.dcm"
    path.write_bytes(make_explicit_mono16(arr, photometric=b"MONOCHROME1"))
    out = read_dicom_image(str(path))
    # MONOCHROME1: high stored value = dark
    assert out[1, 1, 0] == 0 and out[0, 0, 0] == 255


def test_implicit_rgb_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)
    # ensure full range so windowing is identity
    arr.flat[0], arr.flat[1] = 0, 255
    path = tmp_path / "rgb.dcm"
    path.write_bytes(make_implicit_rgb(arr))
    out = read_dicom_image(str(path))
    assert out.shape == (16, 24, 3)
    assert np.array_equal(out, arr)


def test_encapsulated_jpeg(tmp_path):
    # smooth gradient survives JPEG q95 within a small tolerance
    y = np.linspace(0, 255, 64, dtype=np.float32)
    arr = np.broadcast_to(y[:, None], (64, 64)).astype(np.uint8)
    arr = np.stack([arr, arr, arr], axis=-1)
    path = tmp_path / "j.dcm"
    path.write_bytes(make_encapsulated_jpeg(arr))
    out = read_dicom_image(str(path))
    assert out.shape == (64, 64, 3)
    assert np.abs(out.astype(int) - arr.astype(int)).mean() < 3.0


def test_parse_reports_syntax():
    arr = np.zeros((4, 4), np.uint16)
    ds = parse_dicom(make_explicit_mono16(arr))
    assert ds["transfer_syntax"] == "1.2.840.10008.1.2.1"
    assert ds["rows"] == 4 and ds["bits_allocated"] == 16
    assert not ds["encapsulated"]


def test_missing_pixel_data_raises(tmp_path):
    body = _el_explicit(0x0028, 0x0010, b"US", _us(4))
    path = tmp_path / "nopx.dcm"
    path.write_bytes(_meta("1.2.840.10008.1.2.1") + body)
    with pytest.raises(DicomParseError, match="no PixelData"):
        read_dicom_image(str(path))


def test_dicom_folder(tmp_path):
    rng = np.random.default_rng(2)
    for i in range(3):
        arr = rng.integers(0, 255, (20 + i, 20, 3), dtype=np.uint8)
        (tmp_path / f"img{i}.dcm").write_bytes(make_implicit_rgb(arr))
    folder = DicomFolder(str(tmp_path), canonical_size=16)
    assert len(folder) == 3
    img = folder.decode(0)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8


def test_dicom_cohort_trains_end_to_end(tmp_path, synth_root):
    """An ISIC-2020-style cohort of .dcm files (no JPEGs on disk) must
    flow through the FULL training pipeline — LesionTable extension
    probing, decode_image DICOM dispatch, HostImageStore, run_training
    with per-epoch fairness eval — not just the standalone parser."""
    import csv as _csv
    import shutil

    from skin_image_analysis_tpu.data import LesionTable, read_isic_metadata
    from skin_image_analysis_tpu.data.loader import HostImageStore
    from tests.test_e2e_train import _tiny_cfg
    from skin_image_analysis_tpu.train.loop import run_training

    rng = np.random.default_rng(4)
    root = tmp_path / "isic2020"
    root.mkdir()
    shutil.copy(f"{synth_root}/metadata.csv", root / "metadata.csv")
    with open(root / "metadata.csv") as f:
        rows = list(_csv.DictReader(f))
    # label-correlated brightness, mixed RGB/encapsulated-JPEG syntaxes
    for i, row in enumerate(rows):
        base = 60 if row["benign_malignant"] == "malignant" else 180
        arr = (rng.integers(0, 60, (48, 48, 3)) + base).astype(np.uint8)
        blob = (make_implicit_rgb(arr) if i % 2
                else make_encapsulated_jpeg(arr))
        (root / f"{row['isic_id']}.dcm").write_bytes(blob)

    df = read_isic_metadata(str(root), seed=0)
    table = LesionTable(df, str(root))
    assert all(p.endswith(".dcm") for p in table.file_paths())
    store = HostImageStore(table, canonical_size=32, workers=2)
    assert not getattr(store, "bad_rows", [])  # every DICOM decoded
    assert store.images.std() > 0

    cfg = _tiny_cfg(str(root), tmp_path, epochs=1)
    folder = run_training(cfg, verbose=False)
    import json
    import os

    records = []
    for name in os.listdir(folder):
        if name.endswith(".json") and name[0].isdigit():
            with open(os.path.join(folder, name)) as f:
                records += [json.loads(ln) for ln in f if ln.strip()]
    assert len(records) == 1 and "tone_di_results" in records[0]


def test_fuzz_corrupt_dicoms_fail_cleanly(tmp_path):
    """Archive-scale ingest meets truncated/bit-flipped files; the
    parser must either decode or raise a *clean* error (DicomParseError/
    ValueError/OSError) — never hang, recurse, or surface raw
    struct/index errors from parser internals. (The reference dies on
    corrupt files mid-epoch — skimage imread in
    tone_bias_dataset.py:326; our loader turns clean errors into
    zero-filled valid=False rows.)"""
    rng = np.random.default_rng(7)
    mono = make_explicit_mono16(
        (rng.random((8, 8)) * 4000).astype(np.uint16))
    rgb = make_implicit_rgb(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8))
    jpg = make_encapsulated_jpeg(
        rng.integers(0, 255, (8, 8, 3), dtype=np.uint8))
    accepted = (DicomParseError, ValueError, OSError)
    path = tmp_path / "fuzz.dcm"

    def attempt(data: bytes):
        path.write_bytes(data)
        try:
            out = read_dicom_image(str(path))
            assert out.ndim == 3 and out.dtype == np.uint8
        except accepted:
            pass

    for base in (mono, rgb, jpg):
        # truncations at every prefix length step
        for cut in range(0, len(base), 7):
            attempt(base[:cut])
        # single-byte corruptions (past the 128-byte preamble)
        arr = np.frombuffer(base, np.uint8).copy()
        for _ in range(200):
            i = int(rng.integers(128, len(arr)))
            old = arr[i]
            arr[i] = rng.integers(0, 256)
            attempt(arr.tobytes())
            arr[i] = old
        # length-field blowups: stamp huge 32-bit lengths at random
        # element boundaries to probe allocation guards
        for _ in range(40):
            i = int(rng.integers(132, len(arr) - 4))
            view = arr.copy()
            view[i:i + 4] = (0xFF, 0xFF, 0xFF, 0x7F)
            attempt(view.tobytes())
