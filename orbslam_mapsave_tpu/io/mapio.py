"""Map save/load — the fork's signature feature, array-native.

The reference serializes its pointer graph with boost::binary archives
(`System::SaveMap/LoadMap`, `src/System.cc:552-574`; `Map::save/load`,
`src/Map.cc:31-133`) and rebuilds pointers by id search on load
(SURVEY.md §5.4). Here the map IS arrays, so the checkpoint is a direct
`.npz` container of the MapState fields plus a header — save/load is O(1)
rebinding-free, replacing the reference's O(KF*MP) pointer fixup loops
(`src/System.cc:148-195`).

Format `orbtpu-map-v1`: numpy .npz (zip of .npy) with every MapState leaf
under its field name + `__meta__` (json: version, capacities, counters).
Cross-format parity with the reference's boost archive lives in
`boost_parity.py`.
"""

from __future__ import annotations

import io
import json
import zipfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..slammap.mapstate import MapState

FORMAT_VERSION = "orbtpu-map-v1"
# the reference writes a 0xdeadbeef sentinel at the tail (Map.cc:22,66);
# we keep the tradition in the header for integrity checking
SENTINEL = 0xDEADBEEF


def save_map(path: str | Path, state: MapState,
             ts_epoch: float = 0.0, bow_store=None,
             voc_n_words: int | None = None) -> None:
    """Write the full map state (`System::SaveMap` analogue).

    `ts_epoch`: the run's f64 timestamp epoch — device-side `kf_timestamp`
    holds f32 OFFSETS from it (pipeline/tracking.py `Tracker.ts_epoch`);
    persisting it keeps absolute stamps exact across save/load.

    `bow_store`: optional `vocab.database.SparseBowStore` — the per-KF BoW
    rows. The reference REBUILDS its KeyFrameDatabase on every load
    (`src/System.cc:162-163`; its own KeyFrameDatabase serialization exists
    but the call is commented out, `src/System.cc:557,569`). Persisting the
    rows (keyed by `voc_n_words` so a different vocabulary forces a
    rebuild) skips that O(KF) transform cost for large maps — a deliberate
    deviation matching the reference's intended-but-disabled feature."""
    arrays = {k: np.asarray(v) for k, v in state._asdict().items()}
    meta = {
        "version": FORMAT_VERSION,
        "sentinel": SENTINEL,
        "kf_capacity": int(state.kf_capacity),
        "pt_capacity": int(state.pt_capacity),
        "n_features": int(state.n_features),
        "n_kf": int(state.n_kf),
        "n_pt": int(state.n_pt),
        "ts_epoch": float(ts_epoch),
    }
    if bow_store is not None and voc_n_words is not None:
        meta["bow_n_words"] = int(voc_n_words)
        arrays["__bow_word__"] = np.asarray(bow_store.word)
        arrays["__bow_weight__"] = np.asarray(bow_store.weight)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("__meta__.json", json.dumps(meta))
        for k, v in arrays.items():
            buf = io.BytesIO()
            np.save(buf, v)
            zf.writestr(f"{k}.npy", buf.getvalue())


def load_map(path: str | Path) -> MapState:
    """Read a map checkpoint (`System::LoadMap` analogue); validates the
    sentinel like `Map::load` (`src/Map.cc:127-131`)."""
    with zipfile.ZipFile(Path(path), "r") as zf:
        meta = json.loads(zf.read("__meta__.json"))
        if meta.get("sentinel") != SENTINEL or meta.get("version") != FORMAT_VERSION:
            raise ValueError(
                f"bad map file {path}: version={meta.get('version')!r}"
            )
        fields = {}
        names = set(zf.namelist())
        for k in MapState._fields:
            if f"{k}.npy" in names:
                fields[k] = np.load(io.BytesIO(zf.read(f"{k}.npy")))
            else:
                fields[k] = None  # filled below for forward-compat fields
    if fields.get("pt_obs_oct") is None:
        # maps written before the denormalized octave column: derive it
        kf_oct = fields["kf_kp_octave"]
        okf, oix = fields["pt_obs_kf"], fields["pt_obs_idx"]
        ok = okf >= 0
        oct_ = np.full(okf.shape, -1, np.int8)
        oct_[ok] = kf_oct[okf[ok], oix[ok]].astype(np.int8)
        fields["pt_obs_oct"] = oct_
    if fields.get("n_obs_dropped") is None:
        fields["n_obs_dropped"] = np.int32(0)  # pre-telemetry checkpoints
    state = MapState(**fields)
    return jax.tree.map(jnp.asarray, state)


def load_bow_store(path: str | Path, voc_n_words: int):
    """Load the persisted per-KF sparse BoW rows, or None when the file
    predates them / was written with a DIFFERENT vocabulary (word ids are
    vocabulary-specific — a mismatch must fall back to the reference's
    rebuild-on-load, `src/System.cc:162-163`)."""
    with zipfile.ZipFile(Path(path), "r") as zf:
        meta = json.loads(zf.read("__meta__.json"))
        if meta.get("bow_n_words") != int(voc_n_words):
            return None
        names = set(zf.namelist())
        if "__bow_word__.npy" not in names:
            return None
        word = np.load(io.BytesIO(zf.read("__bow_word__.npy")))
        weight = np.load(io.BytesIO(zf.read("__bow_weight__.npy")))
    from ..vocab.database import SparseBowStore

    return SparseBowStore(word=jnp.asarray(word), weight=jnp.asarray(weight))


def read_ts_epoch(path: str | Path) -> float:
    """The f64 timestamp epoch a map was saved with (0.0 for old files)."""
    with zipfile.ZipFile(Path(path), "r") as zf:
        meta = json.loads(zf.read("__meta__.json"))
    return float(meta.get("ts_epoch", 0.0))


def map_summary(state: MapState) -> dict:
    """Counts printed by the reference on save/load (`Map.cc:37,88`)."""
    return {
        "n_keyframes": int(jnp.sum(state.kf_valid)),
        "n_points": int(jnp.sum(state.pt_valid)),
        "n_observations": int(jnp.sum(state.pt_obs_kf >= 0)),
        "max_kf_slot": int(state.n_kf),
        "max_pt_slot": int(state.n_pt),
    }
