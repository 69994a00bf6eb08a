"""Gated DICOM ingest (data/dicom.py): clean error without pydicom,
full path when available."""

import numpy as np
import pytest

from skin_image_analysis_tpu.data.dicom import have_pydicom, read_dicom_image


def test_gate_reports_clearly(tmp_path):
    if have_pydicom():
        pytest.skip("pydicom installed; gate inactive")
    with pytest.raises(ImportError, match="pydicom is not available"):
        read_dicom_image(str(tmp_path / "x.dcm"))


@pytest.mark.skipif(not have_pydicom(), reason="pydicom not installed")
def test_read_dicom_image(tmp_path):
    import pydicom
    from pydicom.dataset import FileDataset

    path = str(tmp_path / "t.dcm")
    ds = FileDataset(path, {}, preamble=b"\x00" * 128)
    arr = (np.random.default_rng(0).random((32, 32)) * 4000).astype(np.uint16)
    ds.Rows, ds.Columns = 32, 32
    ds.BitsAllocated, ds.BitsStored, ds.HighBit = 16, 16, 15
    ds.PixelRepresentation = 0
    ds.SamplesPerPixel = 1
    ds.PhotometricInterpretation = "MONOCHROME2"
    ds.PixelData = arr.tobytes()
    ds.save_as(path)
    out = read_dicom_image(path)
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8
