"""System facade — the public API mirroring the reference's `System` class.

`System` parity (`src/System.cc:85-259`, `include/System.h:81-142`,
SURVEY.md §3.1): constructs the vocabulary, map (fresh or loaded), tracking
and mapping stages, routes frames by sensor type, handles mode switches,
save/load and trajectory export. The reference's four std::threads
(`System.cc:209-238`) become sequential stage calls per frame — tracking,
then mapping for any queued keyframe, then loop closing — which preserves
the algorithmic interleaving (mapping between frames) without shared-memory
races (SURVEY.md §5.2).
"""

from __future__ import annotations

import enum
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as config_mod
from ..geometry import projection
from ..io import trajectory as traj_io
from ..ops import orb
from ..slammap import mapstate as ms
from ..utils import compile_cache
from . import frame as frame_mod
from . import local_mapping, tracking


class Sensor(enum.Enum):
    MONOCULAR = 0
    STEREO = 1
    RGBD = 2


class SLAMSystem:
    """Facade; ctor signature mirrors `System::System`
    (`include/System.h:81-84`) minus the GUI/App extras, which are separate
    optional components (viz/, apps/)."""

    def __init__(self, cfg: config_mod.SystemConfig, sensor: Sensor,
                 vocabulary=None, reuse_map_path: str | None = None,
                 enable_loop_closing: bool = True,
                 enable_mapping: bool = True):
        compile_cache.enable()  # persistent XLA cache for every entry point
        self.cfg = cfg
        self.sensor = sensor
        c = cfg.camera
        self.cam = projection.Camera.create(
            c.fx, c.fy, c.cx, c.cy, c.k1, c.k2, c.p1, c.p2, c.k3,
            bf=c.bf, width=c.width, height=c.height,
        )
        self.spec = orb.ORBSpec.create(
            c.height, c.width,
            n_features=cfg.orb.n_features,
            n_levels=cfg.orb.n_levels,
            scale_factor=cfg.orb.scale_factor,
            ini_th=cfg.orb.ini_th_fast,
            min_th=cfg.orb.min_th_fast,
            max_kp=cfg.max_keypoints,
        )
        self.builder = frame_mod.FrameBuilder(self.cam, self.spec)
        if reuse_map_path:
            from ..io import mapio

            self.map = mapio.load_map(reuse_map_path)
        else:
            self.map = ms.empty_map(cfg.max_keyframes, cfg.max_points,
                                    cfg.max_keypoints)
        # thDepth in meters = bf/fx * ThDepth (Tracking.cc:227-232)
        th_depth_m = float(c.bf) / float(c.fx) * float(c.th_depth)
        is_mono = sensor == Sensor.MONOCULAR
        tcfg = tracking.TrackerConfig(
            max_frames=int(c.fps), th_depth=th_depth_m,
            # local search th: 1 generic, 3 RGB-D (Tracking.cc:1445-1450)
            local_th=3.0 if sensor == Sensor.RGBD else 1.0,
            # motion-model window: 7 stereo, 15 otherwise (Tracking.cc:1127)
            motion_th=7.0 if sensor == Sensor.STEREO else 15.0,
            is_mono=is_mono,
        )
        self.mapper = (
            local_mapping.LocalMapper(
                self.cam, self.builder.inv_level_sigma2,
                is_mono=is_mono,
                scale_factors=self.builder.scale_factors,
                n_levels=cfg.orb.n_levels,
                scale_factor=cfg.orb.scale_factor,
            )
            if enable_mapping else None
        )
        # the mapper's pass runs INSIDE the fused per-frame device program,
        # predicated on keyframe creation (see pipeline/fused_step.py) — the
        # reference's LocalMapping-thread interleaving without host syncs
        self.tracker = tracking.Tracker(
            self.cam, self.builder, self.map, tcfg,
            n_levels=cfg.orb.n_levels, scale_factor=cfg.orb.scale_factor,
            mapper=self.mapper,
        )
        self.loop_closer = None
        if enable_loop_closing and vocabulary is not None:
            from . import loop_closing

            self.loop_closer = loop_closing.LoopCloser(
                self.cam, self.builder.inv_level_sigma2, vocabulary,
                fix_scale=(sensor != Sensor.MONOCULAR),
                scale_factors=self.builder.scale_factors,
                n_levels=cfg.orb.n_levels,
                scale_factor=cfg.orb.scale_factor,
            )
        # relocalization (Tracking.cc:1601): BoW-backed when a vocabulary
        # exists, brute-force fallback otherwise
        from . import relocalization

        self.tracker.relocalizer = relocalization.Relocalizer(
            self.cam, self.builder.inv_level_sigma2, vocabulary,
            bow_store_ref=(
                (lambda: self.loop_closer.bow_store)
                if self.loop_closer is not None else None
            ),
        )
        self.localization_only = False  # ActivateLocalizationMode analogue
        self._shutdown = False
        if reuse_map_path:
            from ..io import mapio

            self.tracker.ts_epoch = mapio.read_ts_epoch(reuse_map_path)
            # reuse mode starts LOST in localization-only, relocalizing
            # against the loaded map (System.cc:90, Tracking.cc:167-171)
            self.localization_only = True
            self.tracker.state = tracking.LOST
            self.tracker.disallow_kf = True
            # restore the BoW database over the loaded keyframes so
            # relocalization retrieves over the WHOLE map: persisted rows
            # when the file carries them for THIS vocabulary, else the
            # reference's rebuild-on-load (`src/System.cc:155-171`)
            self._restore_bow(reuse_map_path)

    def _restore_bow(self, path) -> None:
        """Populate the loop closer's BoW store for a loaded map: persisted
        sparse rows when available and vocabulary-compatible (deviation from
        the reference, documented in `io.mapio.save_map`), otherwise the
        rebuild the reference always pays (`src/System.cc:162-163`)."""
        if self.loop_closer is None or self.loop_closer.voc is None:
            return
        from ..io import mapio

        store = mapio.load_bow_store(path, self.loop_closer.voc.n_words)
        if store is not None and store.word.shape[0] == self.map.kf_capacity:
            self.loop_closer.bow_store = store
        else:
            self.loop_closer.rebuild_store(self.map)

    # ------ frame entry points (System.cc:261-490) ------
    def track_rgbd(self, image, depth, timestamp: float):
        assert self.sensor == Sensor.RGBD
        pose = self.tracker.track_rgbd(image, depth, timestamp)
        self._run_backends()
        return pose

    def track_monocular(self, image, timestamp: float):
        assert self.sensor == Sensor.MONOCULAR
        pose = self.tracker.track_monocular(image, timestamp)
        self._run_backends()
        return pose

    def track_stereo(self, image_left, image_right, timestamp: float):
        assert self.sensor == Sensor.STEREO
        pose = self.tracker.track_stereo(image_left, image_right, timestamp)
        self._run_backends()
        return pose

    def _run_backends(self):
        """Drain the new-keyframe queue through the host-side backends.

        Local mapping already ran inside the fused per-frame program; what
        remains host-mediated is loop closing (the LoopClosing thread body,
        `src/LoopClosing.cc:58-89`) and, for host-created keyframes (the
        monocular bootstrap pair), a mapping pass."""
        self.map = self.tracker.map
        if self.tracker.needs_reset:
            # lost with <= 5 keyframes right after init: start over
            # (`src/Tracking.cc:712-718`)
            self.tracker.needs_reset = False
            self.reset()
            return
        if self.localization_only:
            self.tracker.new_kf_slots.clear()
            self.tracker.host_kf_slots.clear()
            return
        # pump/apply the incremental global-BA job every frame (the
        # reference's GBA thread runs concurrently and joins when done,
        # `src/LoopClosing.cc:643-786`; keyframes created since the loop
        # event take the spanning-tree propagation path at apply time)
        if self.loop_closer is not None and (
            self.loop_closer.pending_gba is not None
        ):
            self.map = self.loop_closer.poll_gba(self.map)
        # host-created KFs (monocular bootstrap) still need a mapping pass
        while self.tracker.host_kf_slots:
            kf = self.tracker.host_kf_slots.pop(0)
            if self.mapper is not None:
                self.map = self.mapper.process(self.map, kf)
            if self.loop_closer is not None:
                self.map = self.loop_closer.process(self.map, kf)
        while self.tracker.new_kf_slots:
            kf = self.tracker.new_kf_slots.pop(0)
            if self.loop_closer is not None:
                self.map = self.loop_closer.process(self.map, kf)
        self._maybe_compact()
        self.tracker.map = self.map

    def _maybe_compact(self):
        """Slot recycling (VERDICT r1 weak #10): when the monotone
        allocators near capacity, renumber live slots into a dense prefix
        and remap every host/device holder of old slot ids. Triggered from
        already-fetched watermarks — no extra device sync."""
        trk = self.tracker
        if trk.ctrl is None:
            return
        cfg = self.cfg
        did = False
        if trk.n_pt_watermark > 0.9 * cfg.max_points:
            self.flush_gba()
            trk.flush()
            self.map, new_pt = ms.compact_points(self.map)
            lm_ = trk.ctrl.last_matched
            trk.ctrl = trk.ctrl._replace(
                last_matched=jnp.where(lm_ >= 0, new_pt[jnp.clip(lm_, 0)], -1),
                recent_start=self.map.n_pt,
            )
            if self.mapper is not None:
                self.mapper.recent_start = self.map.n_pt
            did = True
        if trk.n_kf_watermark > 0.9 * cfg.max_keyframes:
            self.flush_gba()
            trk.flush()
            self.map, new_kf = ms.compact_keyframes(self.map)
            ref = trk.ctrl.ref_kf
            trk.ctrl = trk.ctrl._replace(
                ref_kf=jnp.maximum(new_kf[jnp.clip(ref, 0)], 0))
            trk.ref_kf = max(int(new_kf[trk.ref_kf]), 0) \
                if trk.ref_kf >= 0 else 0
            if self.loop_closer is not None:
                self.loop_closer.remap_keyframes(np.asarray(new_kf))
            did = True
        if did:
            trk.n_pt_watermark = 0
            trk.n_kf_watermark = 0

    # ------ mode switches (System.cc:433-456,492-533) ------
    def activate_localization_mode(self):
        self.localization_only = True
        self.tracker.disallow_kf = True
        if self.tracker.ctrl is not None:
            self.tracker.flush()
            self.tracker.ctrl = self.tracker.ctrl._replace(
                allow_kf=jnp.asarray(False))

    def deactivate_localization_mode(self):
        self.localization_only = False
        self.tracker.disallow_kf = False
        if self.tracker.ctrl is not None:
            self.tracker.flush()
            self.tracker.ctrl = self.tracker.ctrl._replace(
                allow_kf=jnp.asarray(True))

    def reset(self):
        """`System::Reset` / `Tracking::Reset` (`src/Tracking.cc:1777-1819`)."""
        cfg = self.cfg
        self.tracker.flush()
        self.map = ms.empty_map(cfg.max_keyframes, cfg.max_points,
                                cfg.max_keypoints)
        self.tracker.map = self.map
        self.tracker.state = tracking.NO_IMAGES_YET
        self.tracker.ctrl = None
        self.tracker._trajectory.clear()
        self.tracker.new_kf_slots.clear()
        self.tracker.host_kf_slots.clear()
        self.tracker._init_frame = None
        self.tracker.needs_reset = False
        self.tracker.mb_vo = False
        self.tracker.ts_epoch = None
        # allocator watermarks are per-map: stale warm-run values would
        # trigger a spurious compaction (flush + device sync) on the first
        # frames after reset (ADVICE r2)
        self.tracker.n_pt_watermark = 0
        self.tracker.n_kf_watermark = 0
        self.tracker.ba_lanes_dropped = 0
        self.tracker.ba_escalations = 0
        if self.mapper is not None:
            self.mapper.recent_start = None
            self.mapper.ba_lane_log.clear()
        if self.loop_closer is not None:
            if self.loop_closer.pending_gba is not None:
                self.loop_closer.pending_gba.abort()
                self.loop_closer.pending_gba = None
            self.loop_closer.bow_store = None
            self.loop_closer.consistent_groups.clear()
            self.loop_closer.events.clear()
            self.loop_closer._pending_detect = None
            self.loop_closer._pending_sim3 = None
            from . import loop_closing as lc_mod

            self.loop_closer.last_loop_kf = -lc_mod.REFRACTORY_KFS - 1

    def flush_gba(self):
        """Drain pending loop-closing work into the map: an un-polled
        detection, then a pending global-BA job (the reference blocks on
        `isFinishedGBA` at shutdown, `src/System.cc:535-550`)."""
        if self.loop_closer is not None:
            if not self.localization_only:
                # the detect->Sim3 chain resolves over TWO polls (each
                # stage's fetch is deferred one keyframe); drain both
                self.map = self.loop_closer.poll_detect(self.map)
                self.map = self.loop_closer.poll_detect(self.map)
            self.map = self.loop_closer.poll_gba(self.map, force=True)
            self.tracker.map = self.map

    def shutdown(self):
        self.flush_gba()
        self._shutdown = True

    # ------ persistence (System.cc:552-574) ------
    def save_map(self, path: str | Path = "Slam_latest_Map.bin"):
        from ..io import mapio

        self.flush_gba()
        lc = self.loop_closer
        mapio.save_map(
            path, self.map, ts_epoch=self.tracker.ts_epoch or 0.0,
            bow_store=lc.bow_store if lc is not None else None,
            voc_n_words=(lc.voc.n_words
                         if lc is not None and lc.voc is not None else None),
        )

    def load_map(self, path: str | Path):
        from ..io import mapio

        self.tracker.flush()
        self.map = mapio.load_map(path)
        self.tracker.ts_epoch = mapio.read_ts_epoch(path)
        self.tracker.map = self.map
        # KeyFrameDatabase restore over the loaded map (`src/System.cc:
        # 155-171`): persisted rows when compatible, else rebuild
        self._restore_bow(path)
        # reuse mode starts LOST in localization (System.cc:90, Tracking.cc:167-171)
        self.tracker.state = tracking.LOST
        self.localization_only = True
        self.tracker.disallow_kf = True
        if self.tracker.ctrl is not None:
            from . import fused_step

            self.tracker.ctrl = self.tracker.ctrl._replace(
                mode=jnp.asarray(fused_step.MODE_LOST, jnp.int32),
                allow_kf=jnp.asarray(False),
                has_velocity=jnp.asarray(False),
            )

    # ------ trajectory export (System.cc:675-836) ------
    def save_camera_trajectory(self, path: str | Path):
        tr = self.tracker.trajectory
        traj_io.save_camera_trajectory(
            path,
            [t for t, _, _ in tr],
            [p for _, p, _ in tr],
            lost=[l for _, _, l in tr],
        )

    def save_keyframe_trajectory(self, path: str | Path):
        self.flush_gba()
        valid = np.asarray(self.map.kf_valid)
        # device stamps are f32 offsets from the run's f64 epoch (see
        # Tracker.ts_epoch); re-add it here so the written stamps match the
        # reference's double-precision output (`src/System.cc:753-787`)
        epoch = self.tracker.ts_epoch or 0.0
        ts = np.asarray(self.map.kf_timestamp, np.float64)[valid] + epoch
        poses = np.asarray(self.map.kf_pose)[valid]
        traj_io.save_keyframe_trajectory(path, ts, poses)

    def save_localization_trajectory(self, path: str | Path):
        tr = self.tracker.trajectory
        traj_io.save_matrix_trajectory(
            path, [p for _, p, l in tr if not l]
        )

    def save_stereo_keyframe_trajectory(self, path: str | Path):
        """`System::SaveStereoKeyFrameTrajectory` (`src/System.cc:789-836`):
        per-FRAME 3x4 [Rwc|twc] rows (despite the name, the reference walks
        the frame relative-pose lists), normalized so the first keyframe
        sits at the origin (`Two`, `:797`)."""
        self.flush_gba()
        tr = self.tracker.trajectory
        valid = np.asarray(self.map.kf_valid)
        if valid.any():
            first = int(np.nonzero(valid)[0][0])
            Two = np.linalg.inv(np.asarray(self.map.kf_pose[first]))
        else:
            Two = np.eye(4)
        traj_io.save_matrix_trajectory(
            path, [p @ Two for _, p, _ in tr])

    def change_calibration(self, settings_path: str | Path):
        """`Tracking::ChangeCalibration` (`src/Tracking.cc:1821-1852`):
        re-read camera intrinsics/distortion/baseline from a settings yaml
        and rebuild the camera-dependent pipeline stages. The reference
        flips `Frame::mbInitialComputations` so grids/bounds recompute; the
        analog here is rebuilding the jitted closures that captured the
        old Camera."""
        cfg = config_mod.load_camera_settings(settings_path, self.cfg)
        self.cfg = cfg
        c = cfg.camera
        self.cam = projection.Camera.create(
            c.fx, c.fy, c.cx, c.cy, c.k1, c.k2, c.p1, c.p2, c.k3,
            bf=c.bf, width=c.width, height=c.height,
        )
        self.builder = frame_mod.FrameBuilder(self.cam, self.spec)
        self.tracker.flush()
        tcfg = self.tracker.cfg
        tcfg.th_depth = float(c.bf) / float(c.fx) * float(c.th_depth)
        self.tracker.cam = self.cam
        self.tracker.builder = self.builder
        from . import fused_step

        if self.mapper is not None:
            self.mapper = local_mapping.LocalMapper(
                self.cam, self.builder.inv_level_sigma2,
                is_mono=(self.sensor == Sensor.MONOCULAR),
                scale_factors=self.builder.scale_factors,
                n_levels=cfg.orb.n_levels,
                scale_factor=cfg.orb.scale_factor,
            )
        trk = self.tracker
        trk.k = tracking.make_tracking_kernels(
            self.cam, self.builder, cfg.orb.n_levels, cfg.orb.scale_factor)
        trk.step = fused_step.make_fused_step(
            self.cam, self.builder, cfg.orb.n_levels, cfg.orb.scale_factor,
            tcfg, self.mapper)
        # the composed build+step programs captured the OLD step/builder at
        # first trace; rebuild them against the new calibration
        builder = self.builder
        step = trk.step
        trk._composed_rgbd = jax.jit(
            lambda state, ctrl, image, ts, depth: step(
                state, ctrl, builder._build_rgbd(image, ts, depth, None)))
        trk._composed_mono = jax.jit(
            lambda state, ctrl, image, ts: step(
                state, ctrl, builder._build_mono(image, ts, None)))

    # ------ introspection (System.h:144-160 analogues) ------
    @property
    def n_keyframes(self) -> int:
        return int(jnp.sum(self.map.kf_valid))

    @property
    def n_points(self) -> int:
        return int(jnp.sum(self.map.pt_valid))

    @property
    def tracking_state(self) -> int:
        return self.tracker.state
