"""Synthetic SLAM sequence generator: a textured plane rendered with exact
homographies (geometrically perfect ground truth for mono SLAM tests)."""
from __future__ import annotations

import cv2
import numpy as np

from stella_vslam_tpu.ops import lie
import jax.numpy as jnp


class PlaneWorld:
    """Texture on the world plane Z = depth; camera-from-world poses supplied.
    World (X, Y) maps to texture pixels via meters_per_pixel.

    Hardening knobs (all deterministic; VERDICT r4 task 7 — the regimes
    where FAST's two-threshold retry, landmark scale prediction and the
    matcher margins earn their keep):
      * panels: N floating textured rectangles at depths in
        panel_depth_range IN FRONT of the base plane — genuine parallax
        spread and occlusion boundaries (features appear/disappear)
      * noise_sigma: per-pixel Gaussian intensity noise, seeded from the
        pose so identical poses render identically
      * exposure_amp: smooth exposure gain drift as a function of camera
        position (photometric inconsistency between revisits)
    """

    def __init__(self, width=400, height=300, fx=320.0, fy=320.0, depth=4.0,
                 tex_size=2048, meters_per_px=0.01, seed=13,
                 panels=0, panel_depth_range=(2.6, 3.6),
                 noise_sigma=0.0, exposure_amp=0.0):
        self.W, self.H = width, height
        self.fx, self.fy = fx, fy
        self.cx, self.cy = width / 2.0, height / 2.0
        self.depth = depth
        self.mpp = meters_per_px
        self.noise_sigma = float(noise_sigma)
        self.exposure_amp = float(exposure_amp)
        rng = np.random.default_rng(seed)
        tex = np.zeros((tex_size, tex_size), np.float32)
        for _ in range(6000):
            x, y = rng.integers(0, tex_size, 2)
            w, h = rng.integers(4, 40, 2)
            cv2.rectangle(tex, (int(x), int(y)), (int(x + w), int(y + h)),
                          float(rng.uniform(20, 235)), -1)
        # stored (and rendered) as uint8: real camera feeds deliver u8, and
        # a float render would push a ~2 ms/frame clip+cast into the timed
        # feed path of every consumer (System._to_gray)
        self.texture = np.clip(
            cv2.GaussianBlur(tex, (3, 3), 0.8), 0, 255).astype(np.uint8)
        self.tex_size = tex_size
        # floating panels: (x, y, w, h, depth, texture), sorted far->near so
        # nearer panels composite last (painter's occlusion)
        self.panels = []
        if panels:
            span = tex_size * meters_per_px
            prng = np.random.default_rng(seed + 1)
            for _ in range(panels):
                w, h = prng.uniform(0.5, 1.3, 2)
                px = prng.uniform(-span * 0.25, span * 0.48)
                py = prng.uniform(-2.5, 3.0)
                pd = prng.uniform(*panel_depth_range)
                ptex = np.zeros((192, 192), np.float32)
                for _ in range(220):
                    tx, ty = prng.integers(0, 192, 2)
                    tw, th = prng.integers(4, 30, 2)
                    cv2.rectangle(ptex, (int(tx), int(ty)),
                                  (int(tx + tw), int(ty + th)),
                                  float(prng.uniform(20, 235)), -1)
                ptex = np.clip(cv2.GaussianBlur(ptex, (3, 3), 0.8),
                               0, 255).astype(np.uint8)
                self.panels.append((px, py, w, h, pd, ptex))
            self.panels.sort(key=lambda p: -p[4])

    def camera_yaml(self):
        return {
            "name": "synthetic", "setup": "monocular", "model": "perspective",
            "fx": self.fx, "fy": self.fy, "cx": self.cx, "cy": self.cy,
            "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0, "k3": 0.0,
            "fps": 20.0, "cols": self.W, "rows": self.H, "color_order": "Gray",
        }

    def render(self, pose_cw: np.ndarray) -> np.ndarray:
        """Render the image for camera-from-world pose (4x4)."""
        R, t = pose_cw[:3, :3], pose_cw[:3, 3]
        # world plane point: P = (X, Y, depth); X = (u_t - T/2) * mpp etc.
        # camera: pc = [r1 r2] (X, Y) + (depth * r3 + t)
        K = np.array([[self.fx, 0, self.cx], [0, self.fy, self.cy], [0, 0, 1]])
        A = np.stack([R[:, 0], R[:, 1], self.depth * R[:, 2] + t], axis=1)
        # texture px -> world XY: X = (u - T/2) mpp, Y = (v - T/2) mpp
        Tm = np.array(
            [
                [self.mpp, 0, -self.tex_size / 2 * self.mpp],
                [0, self.mpp, -self.tex_size / 2 * self.mpp],
                [0, 0, 1.0],
            ]
        )
        Hmat = K @ A @ Tm
        img = cv2.warpPerspective(
            self.texture, Hmat, (self.W, self.H), flags=cv2.INTER_LINEAR
        )
        for (px, py, w, h, pd, ptex) in self.panels:
            # panel plane Z = pd, world-XY footprint [px +- w/2, py +- h/2]
            A_p = np.stack([R[:, 0], R[:, 1], pd * R[:, 2] + t], axis=1)
            T_p = np.array([
                [w / ptex.shape[1], 0, px - w / 2],
                [0, h / ptex.shape[0], py - h / 2],
                [0, 0, 1.0],
            ])
            Hp = K @ A_p @ T_p
            warped = cv2.warpPerspective(
                ptex, Hp, (self.W, self.H), flags=cv2.INTER_LINEAR,
                borderMode=cv2.BORDER_CONSTANT, borderValue=0)
            mask = cv2.warpPerspective(
                np.full(ptex.shape, 255, np.uint8), Hp, (self.W, self.H),
                flags=cv2.INTER_NEAREST, borderMode=cv2.BORDER_CONSTANT,
                borderValue=0)
            # only when the panel is in FRONT of the camera (positive depth)
            c = -R.T @ t
            if pd - c[2] > 0.2:
                img = np.where(mask > 0, warped, img)
        if self.exposure_amp or self.noise_sigma:
            c = -R.T @ t
            out = img.astype(np.float32)
            if self.exposure_amp:
                g = 1.0 + self.exposure_amp * np.sin(
                    0.7 * c[0] + 1.3 * c[1] + 0.4)
                out *= g
            if self.noise_sigma:
                # seeded from the pose via a STABLE hash (builtin hash() is
                # randomized per process): same pose -> same image, across
                # runs
                import zlib

                key = zlib.crc32(np.round(pose_cw, 6).tobytes())
                nrng = np.random.default_rng(key)
                out += nrng.normal(0.0, self.noise_sigma,
                                   out.shape).astype(np.float32)
            img = np.clip(out, 0, 255).astype(np.uint8)
        return img


class BoxWorld:
    """Textured axis-aligned box room rendered for an equirectangular camera
    by exact per-pixel ray casting (parallax-correct ground truth for 360
    SLAM; the reference's equirectangular datasets are the headline CI runs,
    .github/workflows/main.yml:178-216)."""

    def __init__(self, width=640, height=320, half=4.0, tex_size=1024, seed=5):
        self.W, self.H = width, height
        self.half = half
        rng = np.random.default_rng(seed)
        self.textures = []
        for _ in range(6):
            tex = np.zeros((tex_size, tex_size), np.float32)
            for _k in range(2500):
                x, y = rng.integers(0, tex_size, 2)
                w, h = rng.integers(4, 40, 2)
                cv2.rectangle(tex, (int(x), int(y)), (int(x + w), int(y + h)),
                              float(rng.uniform(20, 235)), -1)
            self.textures.append(cv2.GaussianBlur(tex, (3, 3), 0.8))
        self.tex_size = tex_size
        # pixel-center bearings in camera frame (must match
        # camera.base.bearings_from_undistorted equirect convention)
        u = np.arange(width, dtype=np.float64)
        v = np.arange(height, dtype=np.float64)
        lon = (u - width / 2.0) * (2.0 * np.pi) / width
        lat = -(v - height / 2.0) * np.pi / height
        lon, lat = np.meshgrid(lon, lat)
        self._bearings = np.stack(
            [np.cos(lat) * np.sin(lon), -np.sin(lat), np.cos(lat) * np.cos(lon)],
            axis=-1,
        )  # [H,W,3]

    def camera_yaml(self):
        return {
            "name": "synthetic-360", "setup": "monocular",
            "model": "equirectangular", "fps": 20.0,
            "cols": self.W, "rows": self.H, "color_order": "Gray",
        }

    def render(self, pose_cw: np.ndarray) -> np.ndarray:
        R, t = pose_cw[:3, :3], pose_cw[:3, 3]
        c = -R.T @ t  # camera center (must stay inside the box)
        d = self._bearings @ R  # world-frame ray directions [H,W,3]
        h = self.half
        # exit distance through the axis-aligned box from an interior point
        with np.errstate(divide="ignore", invalid="ignore"):
            d_safe = np.where(np.abs(d) < 1e-12, 1e-12, d)
            t_axis = np.where(d > 0, (h - c) / d_safe, (-h - c) / d_safe)
            t_axis = np.where(np.abs(d) < 1e-12, np.inf, t_axis)
        face_axis = np.argmin(t_axis, axis=-1)  # [H,W]
        t_exit = np.take_along_axis(t_axis, face_axis[..., None], axis=-1)[..., 0]
        p = c + d * t_exit[..., None]  # [H,W,3] hit points
        # face id = axis*2 + (positive side)
        sign_pos = np.take_along_axis(d, face_axis[..., None], axis=-1)[..., 0] > 0
        img = np.zeros((self.H, self.W), np.float32)  # u8 at return
        uv_axes = {0: (1, 2), 1: (0, 2), 2: (0, 1)}
        for axis in range(3):
            for pos in (False, True):
                m = (face_axis == axis) & (sign_pos == pos)
                if not m.any():
                    continue
                a, b = uv_axes[axis]
                tu = (p[m, a] + h) / (2 * h) * (self.tex_size - 1)
                tv = (p[m, b] + h) / (2 * h) * (self.tex_size - 1)
                tex = self.textures[axis * 2 + int(pos)]
                # bilinear sample
                x0 = np.clip(tu.astype(np.int64), 0, self.tex_size - 2)
                y0 = np.clip(tv.astype(np.int64), 0, self.tex_size - 2)
                fx_ = tu - x0
                fy_ = tv - y0
                img[m] = (
                    tex[y0, x0] * (1 - fx_) * (1 - fy_)
                    + tex[y0, x0 + 1] * fx_ * (1 - fy_)
                    + tex[y0 + 1, x0] * (1 - fx_) * fy_
                    + tex[y0 + 1, x0 + 1] * fx_ * fy_
                )
        return np.clip(img, 0, 255).astype(np.uint8)


def lateral_trajectory(n_frames: int, step=0.02, yaw_rate=0.002):
    """Sideways translation with slight yaw, keeping the plane in view."""
    poses = []
    for i in range(n_frames):
        xi = np.array(
            [i * step, 0.002 * i, 0.0, 0.0, yaw_rate * i, 0.0], dtype=np.float32
        )
        R, t = lie.se3_exp(jnp.asarray(xi))
        T = np.eye(4)
        T[:3, :3] = np.asarray(R)
        T[:3, 3] = np.asarray(t)
        poses.append(T)
    return poses


def umeyama_align(est: np.ndarray, gt: np.ndarray):
    """Similarity alignment est -> gt (Umeyama); returns aligned est + (s,R,t)."""
    mu_e, mu_g = est.mean(0), gt.mean(0)
    ec, gc = est - mu_e, gt - mu_g
    cov = gc.T @ ec / len(est)
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1, 1, d])
    R = U @ D @ Vt
    var_e = (ec**2).sum() / len(est)
    s = np.trace(np.diag(S) @ D) / max(var_e, 1e-12)
    t = mu_g - s * R @ mu_e
    return (s * (R @ est.T).T + t), (s, R, t)
