"""Gaussian export: .ply (3DGS layout), .splat, colored point cloud.

TPU-build equivalent of the reference viewer's export panel
(`mtgs/custom_viewer/export_panel.py` in OpenDriveLab/MTGS: splat / ply /
point-cloud export of the trained scene). Exports the *active* gaussians
of a node (or the composed background+skybox scene) so checkpoints can be
inspected in any standard 3DGS viewer.

Formats:
  - `.ply`: the canonical 3DGS binary layout (x y z nx ny nz f_dc_*
    f_rest_* opacity scale_* rot_*), raw parameter space (log scales,
    logit opacities) — what Inria/gsplat tooling reads.
  - `.splat`: antimatter15 web-viewer format, one 32-byte record per
    gaussian (pos f32x3, linear scale f32x3, RGBA u8x4, quat u8x4),
    sorted by volume x opacity descending.
  - point-cloud `.ply`: xyz + u8 RGB from the SH DC term.
"""

from __future__ import annotations

import struct as _struct
from pathlib import Path
from typing import Optional

import numpy as np

from mtgs_tpu.models.gaussians import GaussianNodeParams, NodeAux

_SH_C0 = 0.28209479177387814


def _node_arrays(
    node: GaussianNodeParams, aux: NodeAux, travel_index: Optional[int]
):
    n = int(aux.num_alive)
    means = np.asarray(node.means[:n], np.float32)
    scales = np.asarray(node.scales[:n], np.float32)
    if scales.shape[1] == 1:  # isotropic marbles: untie for the 3DGS layout
        scales = np.repeat(scales, 3, axis=1)
    quats = np.asarray(node.quats[:n], np.float32)
    opac = np.asarray(node.opacities[:n, 0], np.float32)
    dc = np.asarray(node.features_dc[:n], np.float32)
    if travel_index is not None and node.features_adapters.shape[1] > 0:
        dc = dc + np.asarray(
            node.features_adapters[:n, travel_index], np.float32
        )
    rest = node.features_rest
    if rest.ndim == 4:  # per-traversal rest: select the traversal
        rest = rest[:, travel_index if travel_index is not None else 0]
    rest = np.asarray(rest[:n], np.float32)  # [n, K-1, 3]
    return means, scales, quats, opac, dc, rest


def export_ply(
    node: GaussianNodeParams,
    aux: NodeAux,
    path: str | Path,
    *,
    travel_index: Optional[int] = None,
) -> Path:
    """Write the node's active gaussians as a 3DGS-layout binary PLY."""
    means, scales, quats, opac, dc, rest = _node_arrays(node, aux, travel_index)
    n, k1 = means.shape[0], rest.shape[1]
    # 3DGS stores f_rest channel-major: all K-1 red coeffs, then green, blue
    rest_cm = rest.transpose(0, 2, 1).reshape(n, 3 * k1)

    cols = [means, np.zeros((n, 3), np.float32), dc, rest_cm,
            opac[:, None], scales, quats]
    names = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(3 * k1)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    body = np.concatenate(cols, axis=1).astype("<f4")
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {m}\n" for m in names)
        + "end_header\n"
    )
    path = Path(path)
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(body.tobytes())
    return path


def export_splat(
    node: GaussianNodeParams,
    aux: NodeAux,
    path: str | Path,
    *,
    travel_index: Optional[int] = None,
) -> Path:
    """Write the antimatter15 .splat format (web splat viewers)."""
    means, scales, quats, opac, dc, _ = _node_arrays(node, aux, travel_index)
    lin_scales = np.exp(scales)
    alpha = 1.0 / (1.0 + np.exp(-opac))
    order = np.argsort(-(lin_scales.prod(1) * alpha))
    rgb = np.clip(dc * _SH_C0 + 0.5, 0, 1)
    qn = quats / np.maximum(np.linalg.norm(quats, axis=1, keepdims=True), 1e-9)

    path = Path(path)
    with open(path, "wb") as f:
        for i in order:
            f.write(_struct.pack("<3f", *means[i]))
            f.write(_struct.pack("<3f", *lin_scales[i]))
            f.write(bytes(np.clip(
                np.concatenate([rgb[i], [alpha[i]]]) * 255, 0, 255
            ).astype(np.uint8)))
            f.write(bytes(np.clip(
                qn[i] * 128 + 128, 0, 255).astype(np.uint8)))
    return path


def export_point_cloud(
    node: GaussianNodeParams,
    aux: NodeAux,
    path: str | Path,
    *,
    travel_index: Optional[int] = None,
) -> Path:
    """Write active gaussian centers as an xyz+RGB binary PLY."""
    means, _, _, _, dc, _ = _node_arrays(node, aux, travel_index)
    n = means.shape[0]
    rgb = np.clip((dc * _SH_C0 + 0.5) * 255, 0, 255).astype(np.uint8)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    rec = np.zeros(n, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
    rec["xyz"], rec["rgb"] = means.astype("<f4"), rgb
    path = Path(path)
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())
    return path


def read_gaussian_ply(path: str | Path):
    """Read back a 3DGS-layout PLY -> dict of numpy arrays (for tests
    and round-tripping external checkpoints)."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError("not a ply")
        names = []
        n = 0
        while True:
            line = f.readline().strip()
            if line.startswith(b"element vertex"):
                n = int(line.split()[-1])
            elif line.startswith(b"property float"):
                names.append(line.split()[-1].decode())
            elif line == b"end_header":
                break
        body = np.frombuffer(
            f.read(4 * n * len(names)), "<f4").reshape(n, len(names))
    cols = {m: body[:, i] for i, m in enumerate(names)}
    k1 = sum(1 for m in names if m.startswith("f_rest_")) // 3
    out = {
        "means": np.stack([cols["x"], cols["y"], cols["z"]], 1),
        "features_dc": np.stack([cols[f"f_dc_{i}"] for i in range(3)], 1),
        "opacities": cols["opacity"][:, None],
        "scales": np.stack([cols[f"scale_{i}"] for i in range(3)], 1),
        "quats": np.stack([cols[f"rot_{i}"] for i in range(4)], 1),
    }
    if k1:
        rest_cm = np.stack(
            [cols[f"f_rest_{i}"] for i in range(3 * k1)], 1)
        out["features_rest"] = rest_cm.reshape(-1, 3, k1).transpose(0, 2, 1)
    return out
