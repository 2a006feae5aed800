"""Public system API: construction, frame feeding, lifecycle, IO.

Reference: src/stella_vslam/system.{h,cc} — builds all components from config
(cc:38-136), per-frame preprocessing (grayscale, ORB extraction, undistortion,
bearings, stereo/depth matching — cc:368-530), thread startup/shutdown
(cc:199-234), map and trajectory IO entry points (cc:236-298),
pause/resume/reset, enable/disable mapping.
"""
from __future__ import annotations

import os
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stella_vslam_tpu.camera.base import Camera, Setup, camera_from_yaml
from stella_vslam_tpu.config import Config
from stella_vslam_tpu.data.frame import Frame
from stella_vslam_tpu.data.map_database import MapDatabase
from stella_vslam_tpu.feature.orb_extractor import OrbExtractor
from stella_vslam_tpu.feature.orb_params import OrbParams
from stella_vslam_tpu.data.bow_database import BowDatabase
from stella_vslam_tpu.data.bow_vocabulary import BowVocabulary
from stella_vslam_tpu.global_optimization_module import GlobalOptimizationModule
from stella_vslam_tpu.mapping_module import MappingModule
from stella_vslam_tpu.module.relocalizer import Relocalizer
from stella_vslam_tpu.tracking_module import TrackingModule
from stella_vslam_tpu.util.perf import PERF


class System:
    def __init__(self, cfg: Config, vocab_path: Optional[str] = None,
                 inline_mapping: bool = False):
        """inline_mapping=True runs the mapping module synchronously on the
        caller thread after each frame — deterministic, used by tests and
        single-threaded benchmarks."""
        self.cfg = cfg
        self.inline_mapping = inline_mapping
        self.camera: Camera = camera_from_yaml(cfg.section("Camera"))
        self.orb_params = OrbParams.from_yaml(cfg.section("Feature"))
        # named registries serialized with the map — maps are self-describing
        # and may carry several entries (reference camera_database.h,
        # orb_params_database.h); loading a map adds its entries here
        self.cameras = {self.camera.name: self.camera}
        self.orb_params_registry = {self.orb_params.name: self.orb_params}
        pre = cfg.section("Preprocessing")
        min_size = int(pre.get("min_size", 800))
        mask_rects = pre.get("mask_rectangles", None)
        # RGBD depth-unit conversion (reference system.cc:86-92 +
        # util/image_converter.cc:41-43 convert_to_true_depth): raw depth
        # images divide by this factor (TUM RGB-D PNGs: 5000 per meter)
        self.depthmap_factor = float(pre.get("depthmap_factor", 1.0))
        if self.depthmap_factor <= 0.0:
            raise ValueError("depthmap_factor must be greater than 0")

        self.map_db = MapDatabase()
        # `Feature.descriptor_pattern: opencv` swaps in the OpenCV ORB pair
        # table so descriptors are bit-comparable with maps/vocabularies
        # produced by the reference binary (feature/orb_pattern.py)
        self.descriptor_pattern = str(
            cfg.get("Feature", "descriptor_pattern", "native"))
        self.extractor = OrbExtractor(
            self.orb_params, self.camera.width, self.camera.height,
            min_area=min_size, mask_rects=mask_rects,
            descriptor_pattern=self.descriptor_pattern,
        )
        tr = cfg.section("Tracking")
        self.tracker = TrackingModule(
            self.map_db, self.camera, self.orb_params,
            use_fixed_seed=cfg.get("Initializer", "use_fixed_seed", False),
            enable_auto_relocalization=bool(
                tr.get("enable_auto_relocalization", True)),
            margin_last_frame_projection=float(
                tr.get("margin_last_frame_projection", 20.0)),
            margin_local_map_projection=float(
                tr.get("margin_local_map_projection", 5.0)),
            margin_local_map_projection_unstable=float(
                tr.get("margin_local_map_projection_unstable", 20.0)),
            max_num_local_keyfrms=int(tr.get("max_num_local_keyfrms", 60)),
        )
        # proximity thresholds for relocalize_by_pose(_2d)
        # (reference tracking_module.cc:26-27)
        self._reloc_distance_thr = float(
            tr.get("reloc_distance_threshold", 0.2))
        self._reloc_angle_thr = float(tr.get("reloc_angle_threshold", 0.45))
        # inline mapping implies deterministic single-thread semantics all
        # the way down (the reference's DETERMINISTIC switch)
        self.tracker.synchronous = inline_mapping
        from stella_vslam_tpu.module.keyframe_inserter import KeyframeInserter
        self.tracker.keyfrm_inserter = KeyframeInserter.from_yaml(
            self.camera, cfg.section("KeyframeInserter"))
        mp = cfg.section("Mapping")
        self.mapper = MappingModule(
            self.map_db, self.camera, self.orb_params,
            num_covisibilities_for_triangulation=int(
                mp.get("num_covisibilities_for_landmark_generation", 10)),
            num_covisibilities_for_landmark_fusion=int(
                mp.get("num_covisibilities_for_landmark_fusion", 10)),
            baseline_dist_thr_ratio=float(
                mp.get("baseline_dist_thr_ratio", 0.01)),
            baseline_dist_thr=(
                float(mp["baseline_dist_thr"])
                if "baseline_dist_thr" in mp else None),
            num_temporal_keyframes=int(mp.get("num_temporal_keyframes", 15)),
            max_num_local_keyfrms=self.tracker.max_num_local_keyfrms,
        )
        # landmark/keyframe culling thresholds live in the Mapping section
        # (reference local_map_cleaner.cc:9-14 reads the mapping yaml)
        cl = self.mapper.cleaner
        cl.redundant_obs_ratio_thr = float(
            mp.get("redundant_obs_ratio_thr", 0.9))
        cl.observed_ratio_thr = float(mp.get("observed_ratio_thr", 0.3))
        cl.num_reliable_keyfrms = int(mp.get("num_reliable_keyfrms", 2))
        self.mapper.synchronous_ba = inline_mapping
        self.tracker.mapper = self.mapper
        self.tracker.keyfrm_inserter.mapper = self.mapper
        self.mapper.tracker = self.tracker

        # place recognition: matmul-tree vocabulary + inverted index
        # (replaces the reference's FBoW .fbow file; see data/bow_vocabulary.py).
        # Default = the packaged pretrained vocabulary, like the reference's
        # mandatory orb_vocab.fbow argument (system.cc:44-50).
        self.bow_vocab = (
            BowVocabulary.load(vocab_path) if vocab_path
            else BowVocabulary.default()
        )
        self.bow_db = BowDatabase(self.bow_vocab)
        self.mapper.bow_db = self.bow_db
        rl = cfg.section("Relocalizer")
        self.tracker.relocalizer = Relocalizer(
            self.camera, self.orb_params, self.bow_db,
            min_num_bow_matches=int(rl.get("min_num_bow_matches", 20)),
            min_num_valid_obs=int(rl.get("min_num_valid_obs", 50)),
            use_fixed_seed=cfg.get("Initializer", "use_fixed_seed", False),
        )
        from stella_vslam_tpu.camera.base import Setup as _Setup

        ld = cfg.section("LoopDetector")
        self.global_optimizer = GlobalOptimizationModule(
            self.map_db, self.camera, self.orb_params, self.bow_db,
            fix_scale=self.camera.setup != _Setup.MONOCULAR,
            use_fixed_seed=cfg.get("Initializer", "use_fixed_seed", False),
            loop_detector_kwargs=dict(
                num_final_matches_thr=int(
                    ld.get("num_final_matches_threshold", 40)),
                min_continuity=int(ld.get("min_continuity", 3)),
                reject_by_graph_distance=bool(
                    ld.get("reject_by_graph_distance", False)),
                min_distance_on_graph=int(
                    ld.get("min_distance_on_graph", 50)),
            ),
        )
        if not bool(ld.get("enabled", True)):
            self.global_optimizer.disable_loop_detector()
        self.global_optimizer.mapper = self.mapper
        self.mapper.global_optimizer = self.global_optimizer
        self.map_db.on_erase_keyframe.append(self.bow_db.erase_keyframe)

        # per-camera jitted preprocessing: undistort + bearings
        cam = self.camera

        @jax.jit
        def _preprocess(xy):
            und = cam.undistort(xy)
            return und, cam.bearings(und)

        self._preprocess = _preprocess

        # fused mono preprocess: extraction + undistort + bearings + host-
        # mirror pack in ONE device program — each separate jit call costs
        # ~0.3-1.5 ms of client dispatch overhead on the tunneled runtime
        ex = self.extractor

        @jax.jit
        def _mono_preprocess(img):
            from stella_vslam_tpu.data.frame import pack_host_cols

            feats = ex._extract_impl(img, None)[0]
            und = cam.undistort(feats.xy)
            bear = cam.bearings(und)
            neg1 = jnp.full((feats.xy.shape[0],), -1.0, dtype=jnp.float32)
            packed = pack_host_cols(
                feats.xy, und, bear, feats.level, feats.angle, feats.valid,
                feats.response, neg1, neg1, feats.desc)
            return feats, und, bear, packed

        self._mono_preprocess = _mono_preprocess

        # stereo rectification (reference util/stereo_rectifier.cc:14-60):
        # built from the StereoRectifier YAML section when present; applied
        # to every raw input pair in create_stereo_frame
        self.stereo_rectifier = None
        sr = cfg.section("StereoRectifier")
        if sr and self.camera.setup == Setup.STEREO:
            from stella_vslam_tpu.util.stereo_rectifier import StereoRectifier

            self.stereo_rectifier = StereoRectifier(self.camera, sr)

        # fused stereo preprocess: both extractions (one vmapped program),
        # row matching, undistort/bearings, and host-mirror pack in ONE call
        if self.camera.setup == Setup.STEREO:
            from stella_vslam_tpu.match.stereo import stereo_match
            from stella_vslam_tpu.data.frame import pack_host_cols

            orb = self.orb_params
            sf = jnp.asarray(orb.scale_factors, dtype=jnp.float32)
            isf = jnp.asarray(orb.inv_scale_factors, dtype=jnp.float32)

            @jax.jit
            def _stereo_preprocess(img_l, img_r):
                imgs = jnp.stack([img_l.astype(jnp.float32),
                                  img_r.astype(jnp.float32)])
                feats, patches = ex._extract_pair(imgs)
                f_l = jax.tree_util.tree_map(lambda x: x[0], feats)
                f_r = jax.tree_util.tree_map(lambda x: x[1], feats)
                p = cam.params
                x_right, depths = stereo_match(
                    f_l.xy, f_l.level, f_l.desc, f_l.valid, patches[0],
                    f_r.xy, f_r.level, f_r.desc, f_r.valid, patches[1],
                    scale_factors=sf, inv_scale_factors=isf,
                    focal_x_baseline=p.focal_x_baseline,
                    true_baseline=jnp.float32(cam.true_baseline),
                    num_levels=orb.num_levels,
                )
                und = cam.undistort(f_l.xy)
                bear = cam.bearings(und)
                packed = pack_host_cols(
                    f_l.xy, und, bear, f_l.level, f_l.angle, f_l.valid,
                    f_l.response, x_right, depths, f_l.desc)
                return f_l, und, bear, x_right, depths, packed

            self._stereo_preprocess = _stereo_preprocess

        # fiducial markers (reference marker_detector/aruco, MarkerModel yaml)
        self.marker_detector = None
        mm = cfg.section("MarkerModel")
        if mm:
            from stella_vslam_tpu.marker.marker import MarkerInitializer
            from stella_vslam_tpu.marker.marker_detector import MarkerDetector
            from stella_vslam_tpu.marker.marker_model import MarkerModel

            self.marker_model = MarkerModel.from_yaml(mm)
            self.marker_detector = MarkerDetector(self.camera, self.marker_model)
            self.marker_initializer = MarkerInitializer()
            self.tracker.keyfrm_inserter.marker_hook = self._register_markers

        # publishers (reference publish/frame_publisher, map_publisher)
        from stella_vslam_tpu.publish.frame_publisher import FramePublisher
        from stella_vslam_tpu.publish.map_publisher import MapPublisher

        self.frame_publisher = FramePublisher()
        self.map_publisher = MapPublisher(self.map_db)
        self.map_io = None  # created lazily per format

        # stats
        self.track_times = []
        self._running = False
        self._rgbd_preprocess = None  # lazily-jitted fused RGBD program

        # explicit config surface report: which YAML keys are live, which
        # deliberately collapse into this framework's design (e.g. the
        # g2o/gtsam backend selectors), which are unknown and ignored
        cfg.log_collapse_report()

    # ------------------------------------------------------------------
    def startup(self, need_initialize: bool = True, warmup: Optional[bool] = None):
        """warmup=True pre-compiles/loads every steady-state device program
        before the first frame (tracking variants + the mapping thread's
        triangulation/fuse/local-BA programs). Default: env SVT_WARMUP (on).
        Without it, the mapper pays ~10 s of cold-program cost at its first
        keyframe while contending with the tracker for the device — it falls
        queue-full and the backpressure veto starves keyframe insertion for
        the rest of a short run."""
        if warmup is None:
            warmup = os.environ.get("SVT_WARMUP", "1") != "0"
        if warmup:
            self.warmup()
        if not need_initialize:
            self.tracker.state = "Lost"
        if not self.inline_mapping:
            self.mapper.start()
            self.global_optimizer.start()
        self._running = True

    def warmup(self):
        n = self.extractor.num_slots
        self.tracker.warmup(n, self.map_db.device_table.capacity)
        self.mapper.warmup(n)
        if self.global_optimizer.loop_detector_is_enabled():
            # loop-correction programs (Sim3 pose graph + global BA
            # buckets): a cold compile AT the first closure stalls the
            # device pipeline 10-40 s at the worst possible moment
            self.global_optimizer.warmup()
        # relocalization programs compile in the background (off the
        # startup critical path — reloc is rare but its cold compile
        # measured 1.5-2.7 s at the worst moment: tracking just lost)
        if self.tracker.relocalizer is not None:
            import threading as _th

            th = _th.Thread(
                target=self._warm_reloc_bg, args=(n,), daemon=True,
                name="warm-reloc",
            )
            self.tracker._warm_threads.append(th)
            th.start()

    def _warm_reloc_bg(self, n: int):
        try:
            self.tracker.relocalizer.warmup(n)
        except Exception:  # pragma: no cover - best-effort prewarm
            pass

    def shutdown(self):
        self.tracker.finalize_pending()
        if self.inline_mapping:
            self._drain_mapper_inline()
        if not self.inline_mapping:
            # drain before terminate: every fed frame's keyframe event and
            # its loop-detection pass must complete — request_terminate drops
            # whatever is still queued, and a lagging loop-closing thread
            # would otherwise silently lose a loop closure that is sitting
            # in its queue (the saved map must reflect ALL fed frames; the
            # reference feeds in real time so its queues are near-empty at
            # shutdown, system.cc:321-334)
            deadline = time.time() + 120.0
            while time.time() < deadline and not (
                    self.mapper.is_idle()
                    and not self.mapper.keyframe_is_queued()
                    and self.global_optimizer.is_idle()):
                time.sleep(0.01)
            self.mapper.request_terminate()
            self.global_optimizer.request_terminate()
            self.mapper.join()
            self.global_optimizer.join()
        # a jit-compile thread killed at interpreter teardown aborts inside
        # the PJRT client ("terminate called after throwing ...") — wait for
        # stragglers before returning control to the caller
        self.tracker.join_warm_threads()
        self._running = False

    def _drain_mapper_inline(self):
        import queue as _q

        while True:
            try:
                kf = self.mapper._queue.get_nowait()
            except _q.Empty:
                break
            self.mapper.mapping_with_new_keyframe(kf)
            if self.mapper.global_optimizer is not None:
                self.mapper.global_optimizer.process_keyframe(kf)

    # ------------------------------------------------------------------
    def create_monocular_frame(self, img, timestamp: float, mask=None) -> Frame:
        _t0 = time.monotonic()
        img = self._to_gray(img)
        if mask is None:
            _t1 = time.monotonic()
            dev_img = jnp.asarray(img)
            _t2 = time.monotonic()
            feats, und, bear, packed = self._mono_preprocess(dev_img)
            _t3 = time.monotonic()
            frm = Frame(timestamp, self.camera, self.orb_params, feats, und, bear)
            frm.attach_packed_host(packed)
            _t4 = time.monotonic()
            PERF.add("feed/pre.gray", _t1 - _t0)
            PERF.add("feed/pre.upload", _t2 - _t1)
            PERF.add("feed/pre.dispatch", _t3 - _t2)
            PERF.add("feed/pre.frame", _t4 - _t3)
        else:
            feats = self.extractor.extract(jnp.asarray(img), mask)
            und, bear = self._preprocess(feats.xy)
            frm = Frame(timestamp, self.camera, self.orb_params, feats, und, bear)
            frm.prefetch_host()
        if self.marker_detector is not None:
            frm.markers_2d = self.marker_detector.detect(img)
        return frm

    def _register_markers(self, map_db, kf, frm):
        from stella_vslam_tpu.marker.marker import Marker

        for mid, m2d in frm.markers_2d.items():
            mk = map_db.markers.get(mid)
            if mk is None:
                mk = Marker(mid, self.marker_model)
                map_db.markers[mid] = mk
            mk.add_observation(kf.id, m2d)
            self.marker_initializer.check_marker_initialization(mk, map_db)

    def feed_monocular_frame(self, img, timestamp: float, mask=None):
        t0 = time.time()
        frm = self.create_monocular_frame(img, timestamp, mask)
        t1 = time.time()
        t_ext = t1 - t0
        PERF.add("feed/preprocess", t_ext)
        pose = self.tracker.feed_frame(frm)
        PERF.add("feed/track", time.time() - t1)
        if self.inline_mapping:
            self._drain_mapper_inline()
        else:
            self._yield_to_mapper()
        self.track_times.append(time.time() - t0)
        PERF.add("feed/total", self.track_times[-1])
        self._publish(img, frm, pose, extraction_time_s=t_ext)
        return pose

    def _yield_to_mapper(self):
        """When frames arrive faster than real time (offline datasets), the
        caller thread's Python work can starve the mapping thread of the GIL
        and the local map falls behind the motion. Yield briefly while the
        mapper has work — the analog of the reference's backpressure veto
        (keyframe_inserter.cc:59-62), spending idle budget on map freshness."""
        if not self.mapper.is_idle():
            time.sleep(0.002)

    def _publish(self, img, frm, pose, extraction_time_s: float = 0.0):
        # store references only — materialization happens on viewer pull
        # (a blocking fetch here would cost a ~30 ms tunnel round trip).
        # extraction_time_ms is the host wall time of the frame-build
        # dispatch (reference system.cc:540-543 publishes extraction wall
        # time; here extraction runs async on-device, so dispatch wall time
        # is the honest host-side analog)
        self.frame_publisher.update(
            img, frm, self.tracker.state,
            extraction_time_ms=extraction_time_s * 1000.0,
            tracking_time_ms=self.track_times[-1] * 1000.0,
        )
        if pose is not None:
            self.map_publisher.set_current_cam_pose(pose)

    def create_stereo_frame(self, img_left, img_right, timestamp: float,
                            mask=None) -> Frame:
        """Stereo pair -> row-matched depths (reference system.cc:426-470:
        parallel L/R extraction + stereo match; here extraction, row
        matching, undistortion and the host-mirror pack are ONE fused device
        program). When a `StereoRectifier` config section is present, raw
        (distorted/unaligned) input pairs are rectified host-side first —
        the reference examples rectify every EuRoC pair before
        feed_stereo_frame (util/stereo_rectifier.cc:62-67)."""
        gl = self._to_gray(img_left)
        gr = self._to_gray(img_right)
        if self.stereo_rectifier is not None:
            gl, gr = self.stereo_rectifier.rectify(gl, gr)
        feats_l, und, bear, x_right, depths, packed = self._stereo_preprocess(
            jnp.asarray(gl), jnp.asarray(gr))
        frm = Frame(
            timestamp, self.camera, self.orb_params, feats_l, und, bear,
            x_right=x_right, depths=depths,
        )
        frm.attach_packed_host(packed)
        if self.marker_detector is not None:
            frm.markers_2d = self.marker_detector.detect(gl)
        return frm

    def feed_stereo_frame(self, img_left, img_right, timestamp: float, mask=None):
        t0 = time.time()
        frm = self.create_stereo_frame(img_left, img_right, timestamp, mask)
        t_ext = time.time() - t0
        pose = self.tracker.feed_frame(frm)
        if self.inline_mapping:
            self._drain_mapper_inline()
        else:
            self._yield_to_mapper()
        self.track_times.append(time.time() - t0)
        self._publish(img_left, frm, pose, extraction_time_s=t_ext)
        return pose

    def create_RGBD_frame(self, img, depth, timestamp: float, mask=None) -> Frame:
        img = self._to_gray(img)
        # ONE fused program: extraction + undistort/bearings + on-device
        # depthmap sampling + host-mirror pack (a host-side depth gather
        # would block on the keypoint readback, ~30 ms on the tunnel;
        # the reference samples on host, system.cc:500+, because its
        # extraction is host-side — ours is not)
        if self._rgbd_preprocess is None:
            fxb = float(self.camera.params.focal_x_baseline)
            inv_factor = 1.0 / self.depthmap_factor
            cam = self.camera
            ex = self.extractor
            from stella_vslam_tpu.data.frame import pack_host_cols

            @jax.jit
            def _rgbd_preprocess(image, depth_map):
                feats = ex._extract_impl(image, None)[0]
                und = cam.undistort(feats.xy)
                bear = cam.bearings(und)
                h, w = depth_map.shape
                xs = jnp.clip(feats.xy[:, 0].astype(jnp.int32), 0, w - 1)
                ys = jnp.clip(feats.xy[:, 1].astype(jnp.int32), 0, h - 1)
                # convert_to_true_depth (image_converter.cc:41-43): raw
                # units -> meters, fused into the sampling program
                d = depth_map[ys, xs].astype(jnp.float32) * inv_factor
                d = jnp.where(feats.valid & (d > 0), d, -1.0)
                x_right = jnp.where(
                    d > 0, und[:, 0] - fxb / jnp.maximum(d, 1e-6), -1.0)
                packed = pack_host_cols(
                    feats.xy, und, bear, feats.level, feats.angle,
                    feats.valid, feats.response, x_right, d, feats.desc)
                return feats, und, bear, x_right, d, packed

            self._rgbd_preprocess = _rgbd_preprocess
        feats, und, bear, x_right, depths, packed = self._rgbd_preprocess(
            jnp.asarray(img), jnp.asarray(np.asarray(depth, np.float32)))
        frm = Frame(
            timestamp, self.camera, self.orb_params, feats, und, bear,
            x_right=x_right, depths=depths,
        )
        frm.attach_packed_host(packed)
        if self.marker_detector is not None:
            frm.markers_2d = self.marker_detector.detect(img)
        return frm

    def feed_RGBD_frame(self, img, depth, timestamp: float, mask=None):
        t0 = time.time()
        frm = self.create_RGBD_frame(img, depth, timestamp, mask)
        t_ext = time.time() - t0
        pose = self.tracker.feed_frame(frm)
        if self.inline_mapping:
            self._drain_mapper_inline()
        else:
            self._yield_to_mapper()
        self.track_times.append(time.time() - t0)
        self._publish(img, frm, pose, extraction_time_s=t_ext)
        return pose

    @staticmethod
    def _to_gray(img):
        img = np.asarray(img)
        if img.ndim == 3:
            import cv2

            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        # upload u8 (4x less relay traffic); the extractor casts on device
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        return img

    # ------------------------------------------------------------------
    # control (reference system.h:97-183)
    def print_info(self):
        print(f"stella_vslam_tpu: camera={self.camera.name} "
              f"model={self.camera.model.name.lower()} "
              f"setup={self.camera.setup.name.lower()} "
              f"{self.camera.width}x{self.camera.height}@{self.camera.fps}fps, "
              f"ORB {self.orb_params.num_levels} levels "
              f"x{self.orb_params.scale_factor}")

    def get_camera(self) -> Camera:
        return self.camera

    def get_map_publisher(self):
        return self.map_publisher

    def get_frame_publisher(self):
        return self.frame_publisher

    def request_terminate(self):
        """Asynchronous terminate request (reference system.h:180); honored at
        shutdown()."""
        self._terminate_is_requested = True

    def terminate_is_requested(self) -> bool:
        return getattr(self, "_terminate_is_requested", False)

    def reset_is_requested(self) -> bool:
        return getattr(self.tracker, "reset_is_requested", False)

    def enable_mapping_module(self):
        self.tracker.mapping_is_enabled = True

    def disable_mapping_module(self):
        self.tracker.mapping_is_enabled = False

    def mapping_module_is_enabled(self) -> bool:
        return self.tracker.mapping_is_enabled

    def request_reset(self):
        self.tracker.reset()
        self.bow_db.clear()

    def enable_loop_detector(self):
        self.global_optimizer.enable_loop_detector()

    def disable_loop_detector(self):
        self.global_optimizer.disable_loop_detector()

    def loop_detector_is_enabled(self):
        return self.global_optimizer.loop_detector_is_enabled()

    def request_loop_closure(self, keyfrm1_id: int, keyfrm2_id: int) -> bool:
        """Manual loop closure between two keyframes (reference system.h:116)."""
        return self.global_optimizer.request_loop_closure(keyfrm1_id, keyfrm2_id)

    def loop_BA_is_running(self) -> bool:
        return self.global_optimizer.loop_ba_running

    def abort_loop_BA(self):
        self.global_optimizer.abort_loop_BA()

    def pause_tracker(self):
        """Pause frame processing (reference system.h:159: the tracker blocks;
        here subsequent feeds are skipped until resume_tracker)."""
        self.tracker.finalize_pending()
        self.tracker.pause_is_requested = True

    def tracker_is_paused(self) -> bool:
        return getattr(self.tracker, "pause_is_requested", False)

    def resume_tracker(self):
        self.tracker.pause_is_requested = False

    def relocalize_by_pose(self, cam_pose_wc: np.ndarray) -> bool:
        """External pose-hint recovery (reference system.cc:604-612 +
        tracking_module.cc:385-399): the tracker is re-seated AT the given
        world->camera pose — the next frame projection-matches nearby
        keyframes' landmarks from that pose (no BoW) and resumes Tracking on
        success, staying Lost only when the local map yields no matches
        there. Takes cam_pose_wc (camera-to-world) like the reference API."""
        pose_cw = np.linalg.inv(np.asarray(cam_pose_wc, np.float64))
        close = self.map_db.get_close_keyframes(
            pose_cw,
            distance_thr=self._reloc_distance_thr,
            angle_thr=self._reloc_angle_thr,
        )
        if not close:
            return False
        return self._seat_pose_hint(pose_cw, close)

    def relocalize_by_pose_2d(self, cam_pose_wc: np.ndarray,
                              normal: np.ndarray) -> bool:
        pose_cw = np.linalg.inv(np.asarray(cam_pose_wc, np.float64))
        close = self.map_db.get_close_keyframes_2d(
            pose_cw, np.asarray(normal),
            distance_thr=self._reloc_distance_thr,
            angle_thr=self._reloc_angle_thr,
        )
        if not close:
            return False
        return self._seat_pose_hint(pose_cw, close)

    def _seat_pose_hint(self, pose_cw, close_kfs) -> bool:
        tr = self.tracker
        tr.finalize_pending()
        tr.ref_keyfrm_id = close_kfs[0].id
        # make the hinted neighborhood tracking-visible before the attempt
        self.map_db.refresh_device_table(
            center_kf_id=close_kfs[0].id,
            max_local_keyframes=tr.max_num_local_keyfrms)
        tr._pose_hint = (np.asarray(pose_cw, np.float64),
                         [kf.id for kf in close_kfs])
        tr.state = "Lost"
        tr.twist = None
        return True

    def start_new_submap(self):
        """Keep the existing map (e.g. one just loaded) and initialize a NEW
        map component from the next frames: its origin becomes an additional
        spanning root; both components stay walkable via
        map_db.get_keyframes_from_root (reference multi-root
        map_database.h:346-362, graph_node.cc:435)."""
        self.tracker.finalize_pending()
        self.tracker.reset(clear_map=False)

    def enable_temporal_mapping(self):
        """Freeze pre-loaded keyframes; new keyframes become ephemeral
        (reference system.cc:364-366, map_database.h:361-362 +
        mapping_module temporal eviction)."""
        self.map_db.fixed_keyframe_id_threshold = self.map_db.max_keyframe_id()
        self.tracker.mapping_is_enabled = True

    def pause_other_threads(self):
        self.mapper.request_pause()
        while not self.mapper.is_paused() and self.mapper._thread and self.mapper._thread.is_alive():
            time.sleep(0.002)

    def resume_other_threads(self):
        self.mapper.resume()

    # ------------------------------------------------------------------
    # trajectory export (reference io/trajectory_io.cc)
    @property
    def frame_poses(self):
        """Finalized per-frame results: (timestamp, pose_cw|None, ref_kf, id).
        Poses are reconstructed from the stored relative-to-reference-keyframe
        transforms when available, so keyframe refinements (local/global BA,
        loop closure) propagate into the exported trajectory
        (reference frame_statistics + trajectory_io)."""
        md = self.map_db
        out = []
        for entry in self.tracker.finalized:
            fid, ts, pose, ref, rel = entry
            if pose is not None and rel is not None and ref is not None:
                # the reference keyframe may have been culled: chain through
                # the forwarding transforms captured at erase time until a
                # live ancestor is found (reference trajectory_io.cc:40-57
                # walks the spanning tree the same way)
                T_acc, cur, seen = rel, ref, set()
                while (cur is not None and cur not in md.keyframes
                       and cur in md.erased_kf_forward and cur not in seen):
                    seen.add(cur)
                    parent, T_fwd = md.erased_kf_forward[cur]
                    T_acc = T_acc @ T_fwd
                    cur = parent
                kf = md.keyframes.get(cur)
                if kf is not None and not kf.will_be_erased:
                    pose = T_acc @ kf.pose_cw
            out.append((ts, pose, ref, fid))
        return out

    # ------------------------------------------------------------------
    # map save/load (reference system.cc:236-298)
    def save_map_database(self, path: str, fmt: str = None):
        from stella_vslam_tpu.io.map_database_io import create_map_database_io

        fmt = fmt or self.cfg.get("System", "map_format", "msgpack")
        self.pause_other_threads()
        try:
            create_map_database_io(fmt).save(path, self)
        finally:
            self.resume_other_threads()

    def load_map_database(self, path: str, fmt: str = None):
        from stella_vslam_tpu.io.map_database_io import create_map_database_io

        fmt = fmt or self.cfg.get("System", "map_format", "msgpack")
        self.pause_other_threads()
        try:
            create_map_database_io(fmt).load(path, self)
        finally:
            self.resume_other_threads()

    def save_frame_trajectory(self, path: str, fmt: str = "TUM"):
        from stella_vslam_tpu.io.trajectory_io import save_frame_trajectory

        save_frame_trajectory(path, self.frame_poses, fmt)

    def save_keyframe_trajectory(self, path: str, fmt: str = "TUM"):
        from stella_vslam_tpu.io.trajectory_io import save_keyframe_trajectory

        save_keyframe_trajectory(path, self.map_db, fmt)

    def save_track_times(self, path: str):
        with open(path, "w") as f:
            for t in self.track_times:
                f.write(f"{t:.9f}\n")
