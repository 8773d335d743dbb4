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
