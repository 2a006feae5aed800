"""Keypoint -> grid-cell assignment (reference: src/stella_vslam/data/common.cc
assign_keypoints_to_grid / get_cell_indices, used in preprocessing system.cc:392-395).

TPU-first note: the reference builds per-cell index *lists* for windowed search.
On TPU we never need those lists — projection matching is a dense masked O(N*M)
computation (see match/projection.py). The cell index per keypoint is still
computed (cheaply, vectorized) because it is part of the map-serialization surface
and host-side debug tooling.
"""
from __future__ import annotations

import jax.numpy as jnp


def get_cell_indices(
    pts: jnp.ndarray,
    min_x: float,
    min_y: float,
    inv_cell_width: float,
    inv_cell_height: float,
    num_cols: int,
    num_rows: int,
):
    """Undistorted keypoints [N,2] -> (col [N] i32, row [N] i32, inside [N] bool)."""
    col = jnp.floor((pts[..., 0] - min_x) * inv_cell_width).astype(jnp.int32)
    row = jnp.floor((pts[..., 1] - min_y) * inv_cell_height).astype(jnp.int32)
    inside = (col >= 0) & (col < num_cols) & (row >= 0) & (row < num_rows)
    return col, row, inside


def assign_keypoints_to_grid(
    pts: jnp.ndarray,
    valid: jnp.ndarray,
    min_x: float,
    min_y: float,
    inv_cell_width: float,
    inv_cell_height: float,
    num_cols: int,
    num_rows: int,
) -> jnp.ndarray:
    """[N,2] -> flat cell id per keypoint [N] i32; -1 for invalid/outside."""
    col, row, inside = get_cell_indices(
        pts, min_x, min_y, inv_cell_width, inv_cell_height, num_cols, num_rows
    )
    cell = row * num_cols + col
    return jnp.where(valid & inside, cell, -1)
