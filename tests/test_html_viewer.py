"""Interactive HTML map viewer export (the display-less equivalent of the
Pangolin window, `src/Viewer.cc:70-513`)."""

import numpy as np
import jax.numpy as jnp

from orbslam_mapsave_tpu.slammap import mapstate as ms
from orbslam_mapsave_tpu.viz import html_viewer


def test_export_html(tmp_path):
    st = ms.empty_map(8, 256, 32)
    rng = np.random.default_rng(0)
    st = st._replace(
        pt_valid=st.pt_valid.at[:50].set(True),
        pt_pos=st.pt_pos.at[:50].set(jnp.asarray(rng.random((50, 3)))),
        kf_valid=st.kf_valid.at[:3].set(True),
        covis=st.covis.at[0, 1].set(120).at[1, 0].set(120),
        kf_parent=st.kf_parent.at[1].set(0).at[2].set(1),
    )
    p = html_viewer.export_html(
        st, tmp_path / "map_view.html",
        trajectory=np.stack([np.eye(4)] * 5),
        current_pose_cw=np.eye(4),
    )
    s = p.read_text()
    assert "__DATA__" not in s  # data embedded
    # the strong covis edge, spanning tree and trajectory made it in
    assert '"covis_strong": [[0, 1, 120]]' in s
    assert '"tree": [[0, 1], [1, 2]]' in s
    assert s.count("canvas") >= 2 and "<script>" in s  # self-contained


def test_live_html_rewrites(tmp_path):
    """Live mode: the viewer rewrites an auto-refreshing page every N new
    keyframes; the camera state survives reloads via localStorage
    (VERDICT r4 #8; reference anchor src/Viewer.cc:70-513)."""
    import jax.numpy as jnp
    import numpy as np

    from orbslam_mapsave_tpu.slammap import mapstate as ms
    from orbslam_mapsave_tpu.viz import html_viewer
    from orbslam_mapsave_tpu.viz.viewer import Viewer

    st = ms.empty_map(8, 64, 16)
    rng = np.random.default_rng(0)
    kp = dict(
        kp_xy=jnp.asarray(rng.uniform(0, 320, (16, 2)), jnp.float32),
        kp_ur=jnp.full((16,), -1.0, jnp.float32),
        kp_depth=jnp.ones((16,), jnp.float32),
        kp_octave=jnp.zeros((16,), jnp.int32),
        kp_angle=jnp.zeros((16,), jnp.float32),
        kp_valid=jnp.ones((16,), bool),
        desc=jnp.zeros((16, 32), jnp.uint8),
    )
    st, _ = ms.add_keyframe(st, jnp.eye(4), 0.0, 0, **kp)
    out = tmp_path / "live.html"
    p = html_viewer.export_html(st, out, live_refresh=2.0, gen=7)
    html = p.read_text()
    assert 'http-equiv="refresh"' in html
    assert '"gen": 7' in html and '"live": 2.0' in html
    assert "localStorage" in html

    class FakeSystem:
        def __init__(self, state):
            self.map = state
            self.n_keyframes = 1

    sys_ = FakeSystem(st)
    v = Viewer(sys_, out_dir=tmp_path / "v", every_n=10**9,
               live_html=out, live_every_kfs=2)

    class F:  # minimal frame stub (update() won't reach the PNG path)
        kp_xy = np.zeros((1, 2)); valid = np.zeros(1, bool)

    v.update(np.zeros((4, 4)), F(), None)
    assert v._live_gen == 0  # only 1 KF: below the 2-KF rewrite threshold
    sys_.n_keyframes = 3
    v.update(np.zeros((4, 4)), F(), None)
    assert v._live_gen == 1
    assert '"gen": 1' in out.read_text()
