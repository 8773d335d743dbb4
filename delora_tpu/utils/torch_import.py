"""Reference (PyTorch) checkpoint importer -> delora_tpu param tree.

The reference ships trained weights as a torch checkpoint dict
{epoch, model_state_dict, optimizer_state_dict, loss, parameters}
(reference src/deploy/trainer.py:155-161; checkpoints/kitti_example.pth).
This tool maps that state_dict onto our Flax parameter tree so reference
users can carry their trained models over (BASELINE.md parity target).

Layout conversions:
  * conv weights: torch OIHW -> flax HWIO,
  * linear weights: torch [out, in] -> flax [in, out],
  * module name mapping (reference module tree -> our auto-named Flax tree):

      resnet.conv1                       -> CircularResNet_0/ConvCirc_0/Conv_0
      resnet.layer{L}.{B}.conv{1,2}      -> CircularResNet_0/BasicBlock_k/ConvCirc_{0,1}/Conv_0
      resnet.layer{L}.{B}.downsample.0   -> CircularResNet_0/BasicBlock_k/Conv_0
      resnet.fc                          -> CircularResNet_0/Dense_0
      fully_connected_rotation.{1,3}     -> _Mlp_0/Dense_{0,1}
      fully_connected_translation.{1,3}  -> _Mlp_1/Dense_{0,1}
      fully_connected_rot_trans.{1..9}   -> _Mlp_0/Dense_{0..4}   (single-MLP mode)

    where k enumerates blocks across stages in order (layer1.0 -> BasicBlock_0,
    layer1.1 -> BasicBlock_1, layer2.0 -> BasicBlock_2, ...).

Quaternion convention: the reference decodes the 4-vector as kornia-0.3.0
(x, y, z, w) (model_parts.py:30-31) — identical to ours, so head weights map
without permutation.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def torch_state_dict_to_params(
    state_dict: Mapping[str, "np.ndarray"],
    blocks_per_stage=(2, 2, 2, 2),
    use_single_mlp: bool = False,
) -> Dict:
    """state_dict (torch tensors or numpy arrays) -> flax {'params': ...} tree."""
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    }

    resnet: Dict = {}
    resnet["ConvCirc_0"] = {"Conv_0": {"kernel": _conv(sd["resnet.conv1.weight"])}}

    k = 0
    for stage in range(4):
        for block in range(blocks_per_stage[stage]):
            prefix = f"resnet.layer{stage + 1}.{block}"
            entry = {
                "ConvCirc_0": {"Conv_0": {"kernel": _conv(sd[f"{prefix}.conv1.weight"])}},
                "ConvCirc_1": {"Conv_0": {"kernel": _conv(sd[f"{prefix}.conv2.weight"])}},
            }
            if f"{prefix}.downsample.0.weight" in sd:
                entry["Conv_0"] = {
                    "kernel": _conv(sd[f"{prefix}.downsample.0.weight"])
                }
            resnet[f"BasicBlock_{k}"] = entry
            k += 1

    resnet["Dense_0"] = {
        "kernel": _linear(sd["resnet.fc.weight"]),
        "bias": sd["resnet.fc.bias"],
    }

    params: Dict = {"CircularResNet_0": resnet}

    def mlp_from(prefix: str, torch_indices) -> Dict:
        return {
            f"Dense_{i}": {
                "kernel": _linear(sd[f"{prefix}.{t}.weight"]),
                "bias": sd[f"{prefix}.{t}.bias"],
            }
            for i, t in enumerate(torch_indices)
        }

    if use_single_mlp:
        # Sequential indices of Linears: act at 0,2,4,6,8; Linear at 1,3,5,7,9.
        params["_Mlp_0"] = mlp_from("fully_connected_rot_trans", (1, 3, 5, 7, 9))
    else:
        params["_Mlp_0"] = mlp_from("fully_connected_rotation", (1, 3))
        params["_Mlp_1"] = mlp_from("fully_connected_translation", (1, 3))

    return {"params": params}


def load_reference_checkpoint(path: str, **kwargs) -> Dict:
    """Load a reference .pth checkpoint file (requires torch, CPU)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("model_state_dict", ckpt)
    return torch_state_dict_to_params(state_dict, **kwargs)


# ---------------------------------------------------------------------------
# Inverse direction: delora_tpu params -> reference-format torch checkpoint.
# Mirrors the reference's own deployment converter
# (scripts/convert_pytorch_models.py) so a model trained here can be dropped
# into an existing reference/ROS deployment unchanged.
# ---------------------------------------------------------------------------


def params_to_torch_state_dict(
    params: Mapping,
    blocks_per_stage=(2, 2, 2, 2),
    use_single_mlp: bool = False,
) -> Dict[str, np.ndarray]:
    """Flax {'params': ...} tree -> reference-named state_dict (numpy values).

    Exact inverse of :func:`torch_state_dict_to_params`: conv kernels go back
    HWIO -> OIHW, linear kernels [in, out] -> [out, in], and module names map
    onto the reference tree (reference src/models/model.py:14-87,
    resnet_modified.py:12-124)."""
    p = params.get("params", params)
    p = {k: v for k, v in p.items()}

    def np_(x):
        return np.asarray(x)

    def conv_back(w):
        return np.transpose(np_(w), (3, 2, 0, 1))  # HWIO -> OIHW

    def linear_back(w):
        return np.transpose(np_(w), (1, 0))

    resnet = p["CircularResNet_0"]
    sd: Dict[str, np.ndarray] = {}
    sd["resnet.conv1.weight"] = conv_back(
        resnet["ConvCirc_0"]["Conv_0"]["kernel"]
    )

    k = 0
    for stage in range(4):
        for block in range(blocks_per_stage[stage]):
            prefix = f"resnet.layer{stage + 1}.{block}"
            entry = resnet[f"BasicBlock_{k}"]
            sd[f"{prefix}.conv1.weight"] = conv_back(
                entry["ConvCirc_0"]["Conv_0"]["kernel"]
            )
            sd[f"{prefix}.conv2.weight"] = conv_back(
                entry["ConvCirc_1"]["Conv_0"]["kernel"]
            )
            if "Conv_0" in entry:
                sd[f"{prefix}.downsample.0.weight"] = conv_back(
                    entry["Conv_0"]["kernel"]
                )
            k += 1

    sd["resnet.fc.weight"] = linear_back(resnet["Dense_0"]["kernel"])
    sd["resnet.fc.bias"] = np_(resnet["Dense_0"]["bias"])

    def mlp_back(tree: Mapping, prefix: str, torch_indices):
        for i, t in enumerate(torch_indices):
            sd[f"{prefix}.{t}.weight"] = linear_back(tree[f"Dense_{i}"]["kernel"])
            sd[f"{prefix}.{t}.bias"] = np_(tree[f"Dense_{i}"]["bias"])

    if use_single_mlp:
        mlp_back(p["_Mlp_0"], "fully_connected_rot_trans", (1, 3, 5, 7, 9))
    else:
        mlp_back(p["_Mlp_0"], "fully_connected_rotation", (1, 3))
        mlp_back(p["_Mlp_1"], "fully_connected_translation", (1, 3))

    return sd


def save_reference_checkpoint(
    path: str,
    params: Mapping,
    config: Mapping = None,
    epoch: int = 0,
    loss: float = 0.0,
    **kwargs,
) -> None:
    """Write a reference-loadable ``.pth`` checkpoint (requires torch, CPU).

    Produces the dict layout the reference trainer saves and its tester/ROS
    node load (reference src/deploy/trainer.py:155-161): {epoch,
    model_state_dict, optimizer_state_dict, loss, parameters}. Saved with
    ``_use_new_zipfile_serialization=False`` for old-PyTorch ROS hosts, the
    same concern reference scripts/convert_pytorch_models.py:13-16 exists
    to solve."""
    import torch

    sd = params_to_torch_state_dict(params, **kwargs)
    ckpt = {
        "epoch": int(epoch),
        "model_state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                             for k, v in sd.items()},
        "optimizer_state_dict": {},
        "loss": float(loss),
        "parameters": dict(config or {}),
    }
    torch.save(ckpt, path, _use_new_zipfile_serialization=False)
