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
