"""Port PyTorch YOLACT weights (.pth state_dict) to the JAX model.

The reference ships/loads a trained ``yolact_base_54_800000.pth``-style
checkpoint (src/System.cc:106-108, src/python/yolact_interface.py). This
module maps that state_dict's names to our Flax parameter tree so existing
users' weights drop in. Torch (CPU) is only imported here, never in the
SLAM loop.

Conventions: torch convs are (out, in, kh, kw); Flax wants (kh, kw, in, out).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _conv_w(t):
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def _map_backbone(sd: Dict, prefix: str, layers=(3, 4, 6, 3)) -> Dict:
    out = {
        "conv1": {"kernel": _conv_w(sd[f"{prefix}conv1.weight"])},
        "bn1": {
            "scale": np.asarray(sd[f"{prefix}bn1.weight"]),
            "bias": np.asarray(sd[f"{prefix}bn1.bias"]),
            "mean": np.asarray(sd[f"{prefix}bn1.running_mean"]),
            "var": np.asarray(sd[f"{prefix}bn1.running_var"]),
        },
    }
    for s, n in enumerate(layers):
        for b in range(n):
            tp = f"{prefix}layers.{s}.{b}."
            blk = {}
            for i in (1, 2, 3):
                blk[f"conv{i}"] = {"kernel": _conv_w(sd[f"{tp}conv{i}.weight"])}
                blk[f"bn{i}"] = {
                    "scale": np.asarray(sd[f"{tp}bn{i}.weight"]),
                    "bias": np.asarray(sd[f"{tp}bn{i}.bias"]),
                    "mean": np.asarray(sd[f"{tp}bn{i}.running_mean"]),
                    "var": np.asarray(sd[f"{tp}bn{i}.running_var"]),
                }
            if f"{tp}downsample.0.weight" in sd:
                blk["down_conv"] = {
                    "kernel": _conv_w(sd[f"{tp}downsample.0.weight"])
                }
                blk["down_bn"] = {
                    "scale": np.asarray(sd[f"{tp}downsample.1.weight"]),
                    "bias": np.asarray(sd[f"{tp}downsample.1.bias"]),
                    "mean": np.asarray(sd[f"{tp}downsample.1.running_mean"]),
                    "var": np.asarray(sd[f"{tp}downsample.1.running_var"]),
                }
            out[f"layer{s}_{b}"] = blk
    return out


def _conv(sd, name):
    p = {"kernel": _conv_w(sd[f"{name}.weight"])}
    if f"{name}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{name}.bias"])
    return p


def port_state_dict(sd: Dict, layers=(3, 4, 6, 3)) -> Dict:
    """Torch state_dict (tensors or numpy arrays) -> Flax params pytree.

    Name map (public YOLACT implementation, vendored by the reference in
    src/python/yolact.py): ``fpn.lat_layers`` are applied to C5..C3 in
    REVERSED order, so lat_layers.0 pairs with C5 (our lat2).
    """
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}
    params = {
        "backbone": _map_backbone(sd, "backbone.", layers),
        "fpn": {
            "lat2": _conv(sd, "fpn.lat_layers.0"),
            "lat1": _conv(sd, "fpn.lat_layers.1"),
            "lat0": _conv(sd, "fpn.lat_layers.2"),
            "pred0": _conv(sd, "fpn.pred_layers.2"),
            "pred1": _conv(sd, "fpn.pred_layers.1"),
            "pred2": _conv(sd, "fpn.pred_layers.0"),
            "down0": _conv(sd, "fpn.downsample_layers.0"),
            "down1": _conv(sd, "fpn.downsample_layers.1"),
        },
        "proto_net": {
            "conv0": _conv(sd, "proto_net.0"),
            "conv1": _conv(sd, "proto_net.2"),
            "conv2": _conv(sd, "proto_net.4"),
            "conv3": _conv(sd, "proto_net.8"),
            "conv4": _conv(sd, "proto_net.10"),
        },
        "pred_head": {
            "upfeature": _conv(sd, "prediction_layers.0.upfeature.0"),
            "bbox": _conv(sd, "prediction_layers.0.bbox_layer"),
            "conf": _conv(sd, "prediction_layers.0.conf_layer"),
            "mask": _conv(sd, "prediction_layers.0.mask_layer"),
        },
    }
    return {"params": params}


def load_pth(path: str, layers=(3, 4, 6, 3)) -> Dict:
    import torch

    sd = torch.load(path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return port_state_dict(sd, layers)
