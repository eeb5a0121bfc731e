"""Interactive viewer (yasph2d_tpu/viewer.py) driven headlessly on Agg.

No display exists in CI, so the window itself can't open; these tests drive the
same code paths the live window runs: construction, frame ticks through the
TimeManager governor, the velocity-heatmap scatter update, and the reference's
key bindings (Esc/Space/R/H, main.rs:302-337) via synthesized key events.
"""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg", force=True)

from yasph2d_tpu.app import SimulationApp, UpdateMode, default_world
from yasph2d_tpu.viewer import InteractiveViewer


class _Key:
    def __init__(self, key):
        self.key = key


@pytest.fixture(scope="module")
def viewer():
    app = SimulationApp(solver="dfsph_dense", world=default_world(400.0))
    return InteractiveViewer(app, figsize=(4, 3))


@pytest.mark.slow
def test_viewer_ticks_and_updates_scatter(viewer):
    for _ in range(2):
        viewer.tick()
    offsets = np.asarray(viewer.scatter.get_offsets())
    assert offsets.shape[0] == viewer.app.world.num_dynamic_particles
    assert np.isfinite(offsets).all()
    colors = np.asarray(viewer.scatter.get_facecolor())
    assert colors.shape[0] == offsets.shape[0]


@pytest.mark.slow
def test_space_resets_simulation(viewer):
    viewer.tick()
    t_before = viewer.app.time_manager.total_simulated_time
    assert t_before > 0.0
    viewer.on_key(_Key(" "))
    assert viewer.app.time_manager.total_simulated_time == 0.0


@pytest.mark.slow
def test_r_toggles_recording_and_h_toggles_hud(viewer, tmp_path):
    viewer.app.recorder.directory = str(tmp_path)
    assert viewer.app.update_mode == UpdateMode.REALTIME
    viewer.on_key(_Key("r"))
    assert viewer.app.update_mode == UpdateMode.RECORDING
    viewer.tick()  # writes one PNG through the async recorder
    viewer.app.recorder.flush()
    assert list(tmp_path.glob("*.png")), "recording mode must write frames"
    viewer.on_key(_Key("r"))
    assert viewer.app.update_mode == UpdateMode.REALTIME

    hud = viewer.app.show_hud
    viewer.on_key(_Key("h"))
    assert viewer.app.show_hud != hud
    viewer.on_key(_Key("h"))


def test_escape_closes(viewer):
    viewer.on_key(_Key("escape"))
    assert viewer.closed


@pytest.mark.slow
def test_r_retargets_dt_without_recompile(tmp_path):
    """main.rs:318-333 closed: R must retarget the adaptive dt to exact 1/60 s
    recording frames through the traced TimeState scalar, with ZERO recompiles
    of the jitted solver step."""
    app = SimulationApp(solver="dfsph_dense", world=default_world(400.0))
    app.recorder.directory = str(tmp_path)
    v = InteractiveViewer(app, figsize=(4, 3))
    for _ in range(20):  # tick until the governor actually runs (and compiles) a step
        v.tick()
        if app._jitted_step._cache_size() > 0:
            break
    n_compiles = app._jitted_step._cache_size()
    assert n_compiles > 0

    v.on_key(_Key("r"))
    assert app.update_mode == UpdateMode.RECORDING
    assert abs(float(app.carry.time.target_frame_length) - 1.0 / 60.0) < 1e-9
    for _ in range(3):
        v.tick()  # recording mode forces 1/60 frame deltas: steps always run
    assert app._jitted_step._cache_size() == n_compiles, "R must not recompile"

    v.on_key(_Key("r"))
    assert app.update_mode == UpdateMode.REALTIME
    assert float(app.carry.time.target_frame_length) == 0.0
    v.tick()
    assert app._jitted_step._cache_size() == n_compiles
