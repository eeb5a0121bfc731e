"""Camera tests, ported from the reference (src/camera.rs:67-126)."""

import numpy as np

from yasph2d_tpu.render.camera import Camera


def test_construction_from_world_rect():
    camera = Camera.center_around_world_rect(
        (321.0, 123.0, 200.0, 100.0), (10.0, 10.0, 20.0, 40.0)
    )
    assert camera.screen == (321.0, 123.0, 200.0, 100.0)
    assert camera.pixel_per_world_unit == 2.5
    assert camera.position == (20.0, 30.0)


def test_world_to_screen_no_offsets():
    camera = Camera((0.0, 0.0, 200.0, 100.0), 10.0, (0.0, 0.0))
    np.testing.assert_array_equal(
        camera.world_to_screen_coords(np.asarray([0.0, 0.0])), [100.0, 50.0]
    )
    np.testing.assert_array_equal(
        camera.world_to_screen_coords(np.asarray([1.0, 1.0])), [110.0, 40.0]
    )
    np.testing.assert_array_equal(
        camera.world_to_screen_coords(np.asarray([-1.0, -1.0])), [90.0, 60.0]
    )


def test_world_to_screen_camera_offset():
    camera = Camera((0.0, 0.0, 200.0, 100.0), 10.0, (1.0, 1.0))
    np.testing.assert_array_equal(
        camera.world_to_screen_coords(np.asarray([0.0, 0.0])), [90.0, 60.0]
    )
    np.testing.assert_array_equal(
        camera.world_to_screen_coords(np.asarray([1.0, 1.0])), [100.0, 50.0]
    )
    np.testing.assert_array_equal(
        camera.world_to_screen_coords(np.asarray([-1.0, -1.0])), [80.0, 70.0]
    )


def test_world_to_screen_screen_offset():
    camera = Camera((1.0, 2.0, 200.0, 100.0), 10.0, (0.0, 0.0))
    np.testing.assert_array_equal(
        camera.world_to_screen_coords(np.asarray([0.0, 0.0])), [101.0, 52.0]
    )
    np.testing.assert_array_equal(
        camera.world_to_screen_coords(np.asarray([1.0, 1.0])), [111.0, 42.0]
    )
    np.testing.assert_array_equal(
        camera.world_to_screen_coords(np.asarray([-1.0, -1.0])), [91.0, 62.0]
    )


def test_world_to_screen_vectorized():
    camera = Camera((0.0, 0.0, 200.0, 100.0), 10.0, (0.0, 0.0))
    pts = np.asarray([[0.0, 0.0], [1.0, 1.0], [-1.0, -1.0]], dtype=np.float32)
    np.testing.assert_array_equal(
        camera.world_to_screen_coords(pts),
        [[100.0, 50.0], [110.0, 40.0], [90.0, 60.0]],
    )


def test_transformation_matrix_matches_world_to_screen():
    camera = Camera((1.0, 2.0, 200.0, 100.0), 10.0, (3.0, 4.0))
    mat = camera.transformation_matrix()
    p = np.asarray([0.7, -1.3, 0.0, 1.0], dtype=np.float32)
    via_matrix = (mat @ p)[:2]
    direct = camera.world_to_screen_coords(p[:2])
    np.testing.assert_allclose(via_matrix, direct, rtol=1e-6)
