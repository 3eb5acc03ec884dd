"""R3 (real GeoTIFF float32 codec) and R5 (bilinear reprojection) tests."""

from __future__ import annotations

import math
import struct

import numpy as np

from azure_workflow_for_kml_satellite_spark.functions import raster as R
from azure_workflow_for_kml_satellite_spark.functions.geotiff import (
    read_geotiff_f32,
    write_geotiff_f32,
)


def test_geotiff_roundtrip_bits_and_geo():
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(37, 53)).astype(np.float32)
    arr[3, 5] = np.nan
    data = write_geotiff_f32(arr, west=-120.25, north=43.5, px_x=1e-4, px_y=1e-4)
    back, west, north, px, py = read_geotiff_f32(data)
    assert np.array_equal(back, arr, equal_nan=True)
    assert (west, north, px, py) == (-120.25, 43.5, 1e-4, 1e-4)
    # classic LE TIFF header + deflate marker
    order, magic, _ = struct.unpack_from("<2sHI", data, 0)
    assert order == b"II" and magic == 42


def test_geotiff_tags_are_ascending():
    data = write_geotiff_f32(np.zeros((2, 2), np.float32), 0, 0, 1.0, 1.0)
    (_, _, ifd_off) = struct.unpack_from("<2sHI", data, 0)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    tags = [
        struct.unpack_from("<H", data, ifd_off + 2 + i * 12)[0] for i in range(n)
    ]
    assert tags == sorted(tags)  # TIFF 6.0 requires ascending tag order


def test_ndvi_raster_is_real_geotiff(spark):
    from azure_workflow_for_kml_satellite_spark.operators.ndvi import ndvi_stats
    from azure_workflow_for_kml_satellite_spark.operators.spatial_join import (
        spatial_join_best_scene,
    )
    from azure_workflow_for_kml_satellite_spark.operators.aoi import prepare_aois
    from azure_workflow_for_kml_satellite_spark.operators.extract import (
        extract_features,
    )
    from tests.conftest import SF_SMALL

    pages = spark.read.parquet(f"{SF_SMALL}/pages.parquet").limit(10)
    aois = prepare_aois(extract_features(pages))
    best = spatial_join_best_scene(
        aois,
        spark.read.parquet(f"{SF_SMALL}/scenes.parquet"),
        spark.read.parquet(f"{SF_SMALL}/frames.parquet"),
        "2022-01-01",
        "2023-12-31",
    )
    row = (
        ndvi_stats(best, include_raster=True)
        .filter("ndvi_raster is not null")
        .select("ndvi_raster", "valid_pixels", "total_pixels")
        .first()
    )
    arr, west, north, px, py = read_geotiff_f32(bytes(row.ndvi_raster))
    assert arr.size == row.total_pixels
    assert int(np.isfinite(arr).sum()) == row.valid_pixels
    assert px > 0 and py > 0 and -180 <= west <= 180 and -90 <= north <= 90


def test_bilinear_identity():
    rng = np.random.default_rng(2)
    src = rng.normal(size=(20, 30)).astype(np.float32)
    bbox = [10.0, 40.0, 13.0, 42.0]
    out = R.reproject_bilinear(src, bbox, bbox, (20, 30))
    assert np.allclose(out, src, atol=1e-6)


def test_bilinear_plane_is_exact():
    # a linear ramp in lon/lat is reproduced exactly by bilinear interpolation
    bbox_src = [0.0, 0.0, 3.0, 2.0]
    sh, sw = (40, 60)
    px = 3.0 / sw
    py = 2.0 / sh
    lon_c = bbox_src[0] + (np.arange(sw) + 0.5) * px
    lat_c = bbox_src[3] - (np.arange(sh) + 0.5) * py
    src = (2.0 * lon_c[None, :] + 3.0 * lat_c[:, None]).astype(np.float32)
    bbox_dst = [0.5, 0.4, 2.5, 1.6]  # interior window, different resolution
    dh, dw = (23, 37)
    out = R.reproject_bilinear(src, bbox_src, bbox_dst, (dh, dw))
    dlon = bbox_dst[0] + (np.arange(dw) + 0.5) * (2.0 / dw)
    dlat = bbox_dst[3] - (np.arange(dh) + 0.5) * (1.2 / dh)
    want = 2.0 * dlon[None, :] + 3.0 * dlat[:, None]
    assert np.allclose(out, want, atol=1e-4)


def test_bilinear_nodata_and_coverage():
    src = np.ones((10, 10), np.float32)
    bbox = [0.0, 0.0, 1.0, 1.0]
    # destination bbox sticking out of coverage → outside pixels NaN;
    # the dst bbox [-0.5,-0.5,0.5,0.5] overlaps src [0,0,1,1] only in its
    # top-right quadrant
    out = R.reproject_bilinear(src, bbox, [-0.5, -0.5, 0.5, 0.5], (20, 20))
    assert np.isnan(out[0, 0]) and np.isnan(out[-1, -1]) and np.isnan(out[-1, 0])
    assert math.isfinite(out[0, -1])
    # NaN support contaminates neighbours (IEEE propagation), like rasterio
    src[4, 4] = np.nan
    out2 = R.reproject_bilinear(src, bbox, bbox, (20, 20))
    assert np.isnan(out2[9, 9]) and math.isfinite(out2[0, 0])
