"""Pins for the PBR map derivation (operators/pbr.py vs
pbr_map_service.py). The filters are hand-verified numerically since
scipy is absent from the container."""

import numpy as np
import pytest
from pyspark.sql import Row

from mivaa_pdf_extractor_spark.operators.pbr import (
    derive_pbr_maps, gaussian_filter, luminance, normal_map,
    roughness_map, sobel, uniform_filter)


def test_flat_field_encodings():
    flat = np.full((8, 8), 0.4)
    nm = normal_map(flat)
    # dx=dy=0, dz=1 -> (0.5,0.5,1.0)*255 truncated = (127,127,255)
    assert (nm[:, :, 0] == 127).all()
    assert (nm[:, :, 1] == 127).all()
    assert (nm[:, :, 2] == 255).all()
    rg = roughness_map(flat)
    # flat: peak std <= 1e-6 -> 0.5 -> 0.25+0.325=0.575 -> 146
    assert (rg == 146).all()


def test_ramp_gradient_direction():
    # brighter to the right: bright = raised -> dx negative -> the
    # x-channel dips below 127; y stays flat
    x = np.tile(np.arange(16, dtype=float) / 15.0, (16, 1))
    nm = normal_map(x)
    inner = nm[4:-4, 4:-4]
    assert (inner[:, :, 0] < 127).all()
    assert (abs(inner[:, :, 1].astype(int) - 127) <= 1).all()
    # interior sobel of a ramp: 8 * slope (derivative 2c x smooth 4)
    g = gaussian_filter(x, 1.0)
    d = sobel(g, axis=1)
    assert d[8, 8] == pytest.approx(8 * (1 / 15.0), rel=1e-6)


def test_uniform_filter_reflect_boundary():
    a = np.array([[1.0, 2.0, 3.0, 4.0, 5.0]] * 5)
    u = uniform_filter(a, 3)
    # interior: mean of (1,2,3)=2 etc; edge reflects the edge sample
    assert u[2, 1] == pytest.approx(2.0)
    assert u[2, 0] == pytest.approx((1 + 1 + 2) / 3)


def test_gaussian_weights_normalized():
    g = gaussian_filter(np.full((9, 9), 3.0), 1.0)
    assert np.allclose(g, 3.0)  # constant field invariant


def test_luminance_rec709():
    rgb = np.zeros((1, 1, 3))
    rgb[0, 0] = [255.0, 0.0, 0.0]
    assert luminance(rgb)[0, 0] == pytest.approx(0.2126)


def test_spark_plumbing_and_unreadable_rows(spark):
    flat = [0.4] * 24
    images = spark.createDataFrame(
        [Row(image_id="a", width=6, height=4, lum=flat),
         Row(image_id="bad", width=6, height=4, lum=[0.1, 0.2]),
         Row(image_id="null", width=6, height=4, lum=None)],
        "image_id string, width int, height int, lum array<double>")
    rows = {r["image_id"]: r.asDict()
            for r in derive_pbr_maps(images).collect()}
    # unreadable inputs produce NO row, like the reference's None
    assert set(rows) == {"a"}
    a = rows["a"]
    assert a["metalness_zero"] is True
    assert len(a["normal"]) == 24 * 3
    assert len(a["roughness"]) == 24
    assert a["roughness_mean"] == 146.0
    assert a["normal_mean"] == pytest.approx(
        (127 + 127 + 255) / 3, abs=0.01)
