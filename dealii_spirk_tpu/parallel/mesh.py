"""Mesh construction: the (stage, space) processor grid on devices.

Replaces ``create_rectangular_comm`` / ``create_row_comm`` /
``create_column_comm`` (reference ``main.cc:277-446``, wired in ``main()``
at ``main.cc:3645-3698``): given D devices and a stage-axis extent s
(q for spirk, ceil(q/2) for complex_spirk, 1 otherwise — reference
``main.cc:3660-3666``), build a Mesh of shape (s, D // s).  Devices that
would not fit a full rectangle are dropped, mirroring the reference's
rectangular-communicator trimming (``main.cc:365-405``).

``do_row_major`` controls which axis varies fastest in device order — the
analog of the reference's virtual-topology placement (``lex_to_pair``,
``main.cc:281-293``): row-major puts consecutive devices along the stage
axis (stage groups ICI-adjacent), column-major along space.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def stage_space_shape(
    n_devices: int, stage_size: int, max_ranks: int = 0
) -> tuple[int, int]:
    if max_ranks:
        n_devices = min(n_devices, max_ranks)  # reference main.cc:3647-3658
    if n_devices < stage_size:
        raise ValueError(
            f"{n_devices} devices cannot host a stage axis of {stage_size} "
            f"(reference asserts the same, main.cc:3668-3669)"
        )
    return stage_size, n_devices // stage_size


def make_mesh(
    stage_size: int,
    *,
    devices=None,
    max_ranks: int = 0,
    do_row_major: bool = True,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    s, c = stage_space_shape(len(devices), stage_size, max_ranks)
    used = np.asarray(devices[: s * c])
    if do_row_major:
        grid = used.reshape(c, s).T  # consecutive devices along stage
    else:
        grid = used.reshape(s, c)
    return Mesh(grid, axis_names=("stage", "space"))
