"""Camera models as pure, batched JAX functions over a uniform parameter record.

TPU-native redesign of the reference's virtual-dispatch camera hierarchy
(reference: src/stella_vslam/camera/base.h:56-177 and the four concrete models
perspective.cc / fisheye.cc / equirectangular.cc / radial_division.cc).

Instead of C++ virtual methods per point, every model is a set of vectorized
functions [N,2] -> [N,...] selected by a *static* model enum at trace time, so
each jitted program specializes to one model with zero dispatch overhead. All
distortion inversion is fixed-iteration Newton (branch-free, jit-safe), replacing
cv::undistortPoints.

A single `CameraParams` NamedTuple holds the union of model parameters; unused
entries are zero. This keeps one pytree type flowing through every kernel.
"""
from __future__ import annotations

import enum
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class CameraModel(enum.IntEnum):
    # mirrors reference camera/base.h:16-31 model_type_t
    PERSPECTIVE = 0
    FISHEYE = 1
    EQUIRECTANGULAR = 2
    RADIAL_DIVISION = 3


class Setup(enum.IntEnum):
    # mirrors reference camera/base.h setup_type_t
    MONOCULAR = 0
    STEREO = 1
    RGBD = 2


class CameraParams(NamedTuple):
    """Union of all model parameters (f32 scalars). Zero where unused."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    # perspective radial-tangential: k1 k2 p1 p2 k3
    # fisheye (Kannala-Brandt): k1 k2 k3 k4 (p1=p2 unused)
    # radial division: k1 only
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    k3: jnp.ndarray
    k4: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray
    # stereo (reference camera/base.h:112-120)
    focal_x_baseline: jnp.ndarray
    depth_thr: jnp.ndarray


def make_params(
    fx=0.0, fy=0.0, cx=0.0, cy=0.0, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0, k4=0.0,
    width=0, height=0, focal_x_baseline=0.0, depth_thr=40.0,
) -> CameraParams:
    f = lambda v: jnp.asarray(v, dtype=jnp.float32)
    return CameraParams(
        fx=f(fx), fy=f(fy), cx=f(cx), cy=f(cy), k1=f(k1), k2=f(k2), p1=f(p1),
        p2=f(p2), k3=f(k3), k4=f(k4), width=f(width), height=f(height),
        focal_x_baseline=f(focal_x_baseline), depth_thr=f(depth_thr),
    )


# ---------------------------------------------------------------------------
# perspective (pinhole + radtan), reference camera/perspective.cc
# ---------------------------------------------------------------------------


def _radtan_distort(p: CameraParams, xy: jnp.ndarray) -> jnp.ndarray:
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (p.k1 + r2 * (p.k2 + r2 * p.k3))
    xd = x * radial + 2.0 * p.p1 * x * y + p.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p.p1 * (r2 + 2.0 * y * y) + 2.0 * p.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def _perspective_undistort_norm(p: CameraParams, xyd: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Invert radtan by fixed-point iteration on normalized coords (cv-compatible)."""
    xy = xyd
    for _ in range(iters):
        d = _radtan_distort(p, xy) - xy  # pure distortion delta
        xy = xyd - d
    return xy


def perspective_undistort(p: CameraParams, pts: jnp.ndarray) -> jnp.ndarray:
    """Pixel keypoints [N,2] -> undistorted pixel keypoints (same K)."""
    xn = (pts[..., 0] - p.cx) / p.fx
    yn = (pts[..., 1] - p.cy) / p.fy
    xy = _perspective_undistort_norm(p, jnp.stack([xn, yn], axis=-1))
    return jnp.stack([xy[..., 0] * p.fx + p.cx, xy[..., 1] * p.fy + p.cy], axis=-1)


def perspective_distort(p: CameraParams, pts: jnp.ndarray) -> jnp.ndarray:
    """Undistorted pixel keypoints -> raw (distorted) pixel keypoints."""
    xn = (pts[..., 0] - p.cx) / p.fx
    yn = (pts[..., 1] - p.cy) / p.fy
    xy = _radtan_distort(p, jnp.stack([xn, yn], axis=-1))
    return jnp.stack([xy[..., 0] * p.fx + p.cx, xy[..., 1] * p.fy + p.cy], axis=-1)


# ---------------------------------------------------------------------------
# fisheye (Kannala-Brandt k1..k4), reference camera/fisheye.cc
# ---------------------------------------------------------------------------


def _kb_distort_theta(p: CameraParams, theta: jnp.ndarray) -> jnp.ndarray:
    t2 = theta * theta
    return theta * (1.0 + t2 * (p.k1 + t2 * (p.k2 + t2 * (p.k3 + t2 * p.k4))))


def _kb_undistort_theta(p: CameraParams, theta_d: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    theta = theta_d
    for _ in range(iters):
        t2 = theta * theta
        f = theta * (1.0 + t2 * (p.k1 + t2 * (p.k2 + t2 * (p.k3 + t2 * p.k4)))) - theta_d
        df = 1.0 + t2 * (3.0 * p.k1 + t2 * (5.0 * p.k2 + t2 * (7.0 * p.k3 + t2 * 9.0 * p.k4)))
        theta = theta - f / jnp.where(jnp.abs(df) < 1e-6, 1.0, df)
    return theta


def fisheye_undistort(p: CameraParams, pts: jnp.ndarray) -> jnp.ndarray:
    xn = (pts[..., 0] - p.cx) / p.fx
    yn = (pts[..., 1] - p.cy) / p.fy
    theta_d = jnp.sqrt(xn * xn + yn * yn)
    theta = _kb_undistort_theta(p, theta_d)
    scale = jnp.where(theta_d > 1e-8, jnp.tan(theta) / jnp.maximum(theta_d, 1e-8), 1.0)
    return jnp.stack(
        [xn * scale * p.fx + p.cx, yn * scale * p.fy + p.cy], axis=-1
    )


def fisheye_distort(p: CameraParams, pts: jnp.ndarray) -> jnp.ndarray:
    xn = (pts[..., 0] - p.cx) / p.fx
    yn = (pts[..., 1] - p.cy) / p.fy
    r = jnp.sqrt(xn * xn + yn * yn)
    theta = jnp.arctan(r)
    theta_d = _kb_distort_theta(p, theta)
    scale = jnp.where(r > 1e-8, theta_d / jnp.maximum(r, 1e-8), 1.0)
    return jnp.stack([xn * scale * p.fx + p.cx, yn * scale * p.fy + p.cy], axis=-1)


# ---------------------------------------------------------------------------
# radial division (Fitzgibbon), reference camera/radial_division.cc
# ---------------------------------------------------------------------------


def radial_division_undistort(p: CameraParams, pts: jnp.ndarray) -> jnp.ndarray:
    xn = (pts[..., 0] - p.cx) / p.fx
    yn = (pts[..., 1] - p.cy) / p.fy
    r2 = xn * xn + yn * yn
    denom = 1.0 + p.k1 * r2
    scale = 1.0 / jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
    return jnp.stack([xn * scale * p.fx + p.cx, yn * scale * p.fy + p.cy], axis=-1)


def radial_division_distort(p: CameraParams, pts: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Invert the division model by Newton on radius."""
    xn = (pts[..., 0] - p.cx) / p.fx
    yn = (pts[..., 1] - p.cy) / p.fy
    ru = jnp.sqrt(xn * xn + yn * yn)  # undistorted radius
    rd = ru
    for _ in range(iters):
        # solve rd / (1 + k1 rd^2) = ru
        denom = 1.0 + p.k1 * rd * rd
        f = rd / denom - ru
        df = (1.0 - p.k1 * rd * rd) / (denom * denom)
        rd = rd - f / jnp.where(jnp.abs(df) < 1e-8, 1e-8, df)
    scale = jnp.where(ru > 1e-8, rd / jnp.maximum(ru, 1e-8), 1.0)
    return jnp.stack([xn * scale * p.fx + p.cx, yn * scale * p.fy + p.cy], axis=-1)


# ---------------------------------------------------------------------------
# bearings & reprojection (all models)
# ---------------------------------------------------------------------------


def undistort_keypoints(model: CameraModel, p: CameraParams, pts: jnp.ndarray) -> jnp.ndarray:
    if model == CameraModel.PERSPECTIVE:
        return perspective_undistort(p, pts)
    if model == CameraModel.FISHEYE:
        return fisheye_undistort(p, pts)
    if model == CameraModel.EQUIRECTANGULAR:
        return pts
    if model == CameraModel.RADIAL_DIVISION:
        return radial_division_undistort(p, pts)
    raise ValueError(model)


def bearings_from_undistorted(model: CameraModel, p: CameraParams, pts: jnp.ndarray) -> jnp.ndarray:
    """Undistorted keypoints [N,2] -> unit bearing vectors [N,3]."""
    if model == CameraModel.EQUIRECTANGULAR:
        lon = (pts[..., 0] - p.cx) * (2.0 * jnp.pi) / p.width
        lat = -(pts[..., 1] - p.cy) * jnp.pi / p.height
        x = jnp.cos(lat) * jnp.sin(lon)
        y = -jnp.sin(lat)
        z = jnp.cos(lat) * jnp.cos(lon)
        return jnp.stack([x, y, z], axis=-1)
    xn = (pts[..., 0] - p.cx) / p.fx
    yn = (pts[..., 1] - p.cy) / p.fy
    v = jnp.stack([xn, yn, jnp.ones_like(xn)], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def undistorted_from_bearings(model: CameraModel, p: CameraParams, bearings: jnp.ndarray) -> jnp.ndarray:
    if model == CameraModel.EQUIRECTANGULAR:
        x, y, z = bearings[..., 0], bearings[..., 1], bearings[..., 2]
        lat = -jnp.arcsin(jnp.clip(y, -1.0, 1.0))
        lon = jnp.arctan2(x, z)
        u = p.cx + lon * p.width / (2.0 * jnp.pi)
        v = p.cy - lat * p.height / jnp.pi
        return jnp.stack([u, v], axis=-1)
    z = bearings[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = p.fx * bearings[..., 0] / zs + p.cx
    v = p.fy * bearings[..., 1] / zs + p.cy
    return jnp.stack([u, v], axis=-1)


def reproject_to_image(
    model: CameraModel,
    p: CameraParams,
    R_cw: jnp.ndarray,
    t_cw: jnp.ndarray,
    pos_w: jnp.ndarray,
):
    """World points [N,3] -> (uv [N,2], depth-ish [N], visible [N] bool).

    Matches reference camera::base::reproject_to_image semantics: the visibility
    flag combines positive depth and in-image-bounds checks
    (reference camera/perspective.cc reproject_to_image).
    For equirectangular, every direction is projectable; 'depth' is the norm.
    """
    pc = jnp.einsum("ij,...j->...i", R_cw, pos_w) + t_cw
    if model == CameraModel.EQUIRECTANGULAR:
        norm = jnp.linalg.norm(pc, axis=-1)
        b = pc / jnp.maximum(norm[..., None], 1e-12)
        uv = undistorted_from_bearings(model, p, b)
        visible = norm > 1e-6
        return uv, norm, visible
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = p.fx * pc[..., 0] / zs + p.cx
    v = p.fy * pc[..., 1] / zs + p.cy
    uv = jnp.stack([u, v], axis=-1)
    visible = (
        (z > 0.0)
        & (u >= 0.0)
        & (u < p.width)
        & (v >= 0.0)
        & (v < p.height)
    )
    return uv, z, visible


# ---------------------------------------------------------------------------
# Host-side camera object (construction, YAML, image bounds)
# ---------------------------------------------------------------------------


class Camera:
    """Host-side camera record: static model/setup + device param struct.

    Mirrors the public surface of reference camera::base (camera/base.h:56-177)
    but all geometric math lives in the module-level pure functions above.
    """

    def __init__(
        self,
        name: str,
        model: CameraModel,
        setup: Setup,
        params: CameraParams,
        fps: float = 30.0,
        color_order: str = "Gray",
        *,
        width: int,
        height: int,
        num_grid_cols: int = 64,
        num_grid_rows: int = 48,
    ):
        self.name = name
        self.model = model
        self.setup = setup
        self.params = params
        self.fps = float(fps)
        self.color_order = color_order
        self.width = int(width)
        self.height = int(height)
        self.num_grid_cols = num_grid_cols
        self.num_grid_rows = num_grid_rows
        self._compute_image_bounds()

    # reference: camera/perspective.cc compute_image_bounds — undistort the
    # image corners (+ edge midpoints for fisheye safety) to get the valid
    # undistorted-keypoint bounding box used for grid assignment.
    def _compute_image_bounds(self):
        if self.model == CameraModel.EQUIRECTANGULAR:
            self.img_bounds = (0.0, float(self.width), 0.0, float(self.height))
        else:
            w, h = float(self.width), float(self.height)
            corners = np.array(
                [
                    [0, 0], [w, 0], [0, h], [w, h],
                    [w / 2, 0], [w / 2, h], [0, h / 2], [w, h / 2],
                ],
                dtype=np.float32,
            )
            und = np.asarray(
                undistort_keypoints(self.model, self.params, jnp.asarray(corners))
            )
            self.img_bounds = (
                float(und[:, 0].min()),
                float(und[:, 0].max()),
                float(und[:, 1].min()),
                float(und[:, 1].max()),
            )
        min_x, max_x, min_y, max_y = self.img_bounds
        self.inv_cell_width = self.num_grid_cols / (max_x - min_x)
        self.inv_cell_height = self.num_grid_rows / (max_y - min_y)

    @property
    def true_baseline(self) -> float:
        fx = float(self.params.fx)
        return float(self.params.focal_x_baseline) / fx if fx != 0 else 0.0

    def undistort(self, pts):
        return undistort_keypoints(self.model, self.params, pts)

    def bearings(self, und_pts):
        return bearings_from_undistorted(self.model, self.params, und_pts)

    def reproject(self, R_cw, t_cw, pos_w):
        return reproject_to_image(self.model, self.params, R_cw, t_cw, pos_w)

    def to_json(self):
        p = self.params
        g = lambda v: float(v)
        return {
            "name": self.name,
            "model_type": CameraModel(self.model).name.lower(),
            "setup_type": Setup(self.setup).name.lower(),
            "fps": self.fps,
            "cols": self.width,
            "rows": self.height,
            "fx": g(p.fx), "fy": g(p.fy), "cx": g(p.cx), "cy": g(p.cy),
            "k1": g(p.k1), "k2": g(p.k2), "p1": g(p.p1), "p2": g(p.p2),
            "k3": g(p.k3), "k4": g(p.k4),
            "focal_x_baseline": g(p.focal_x_baseline),
            "depth_thr": g(p.depth_thr),
            "color_order": self.color_order,
        }

    @staticmethod
    def from_json(d: dict) -> "Camera":
        model = CameraModel[d["model_type"].upper().replace("-", "_")]
        setup = Setup[d["setup_type"].upper().replace("-", "_")]
        params = make_params(
            fx=d.get("fx", 0.0), fy=d.get("fy", 0.0), cx=d.get("cx", 0.0),
            cy=d.get("cy", 0.0), k1=d.get("k1", 0.0), k2=d.get("k2", 0.0),
            p1=d.get("p1", 0.0), p2=d.get("p2", 0.0), k3=d.get("k3", 0.0),
            k4=d.get("k4", 0.0), width=d["cols"], height=d["rows"],
            focal_x_baseline=d.get("focal_x_baseline", 0.0),
            depth_thr=d.get("depth_thr", 40.0),
        )
        return Camera(
            d.get("name", "cam"), model, setup, params, fps=d.get("fps", 30.0),
            color_order=d.get("color_order", "Gray"),
            width=d["cols"], height=d["rows"],
        )


_MODEL_ALIASES = {
    "perspective": CameraModel.PERSPECTIVE,
    "fisheye": CameraModel.FISHEYE,
    "equirectangular": CameraModel.EQUIRECTANGULAR,
    "radialdivision": CameraModel.RADIAL_DIVISION,
    "radial_division": CameraModel.RADIAL_DIVISION,
    "radial division": CameraModel.RADIAL_DIVISION,
}

_SETUP_ALIASES = {
    "monocular": Setup.MONOCULAR,
    "stereo": Setup.STEREO,
    "rgbd": Setup.RGBD,
    "rgb-d": Setup.RGBD,
}


def camera_from_yaml(node: dict) -> Camera:
    """Build a Camera from a reference-compatible YAML 'Camera' section
    (reference: camera_factory.h; example/euroc/EuRoC_mono.yaml Camera keys)."""
    model = _MODEL_ALIASES[str(node["model"]).strip().lower()]
    setup = _SETUP_ALIASES[str(node["setup"]).strip().lower()]
    # equirectangular projection is centered on the image (reference
    # camera/equirectangular.cc uses cols/2, rows/2 implicitly)
    cx_default = node["cols"] / 2.0 if model == CameraModel.EQUIRECTANGULAR else 0.0
    cy_default = node["rows"] / 2.0 if model == CameraModel.EQUIRECTANGULAR else 0.0
    params = make_params(
        fx=node.get("fx", 0.0), fy=node.get("fy", 0.0),
        cx=node.get("cx", cx_default), cy=node.get("cy", cy_default),
        k1=node.get("k1", 0.0), k2=node.get("k2", 0.0),
        p1=node.get("p1", 0.0), p2=node.get("p2", 0.0),
        k3=node.get("k3", 0.0), k4=node.get("k4", 0.0),
        width=node["cols"], height=node["rows"],
        focal_x_baseline=node.get("focal_x_baseline", 0.0),
        depth_thr=node.get("depth_threshold", 40.0),
    )
    return Camera(
        node.get("name", "camera"), model, setup, params,
        fps=node.get("fps", 30.0), color_order=node.get("color_order", "Gray"),
        width=node["cols"], height=node["rows"],
    )
