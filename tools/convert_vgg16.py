"""Convert a torchvision VGG16 checkpoint (.pth state_dict) to our param
layout, once, offline.

The reference downloads torchvision's ImageNet-pretrained VGG16 at model
construction (reference src/model.py:204-207).  This environment has no
network egress and no torchvision, but torch can read the raw .pth file
(vgg16-397923af.pth) if the user supplies one:

    python tools/convert_vgg16.py --pth vgg16-397923af.pth --out assets/vgg16

The output directory is consumed via `--vgg16_weights assets/vgg16`
(Config flag); without it VGG16 trains from torchvision's random init
(umpr_tpu/models/visual_net.py documents the init scheme).

Layout mapping:
  features.{2i}.weight  (O, I, 3, 3) -> features[i].kernel (3, 3, I, O)  [OIHW->HWIO]
  classifier.{0,3,6}.weight (O, I)   -> classifier[j].kernel (I, O)
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def convert(pth_path, out_dir):
    import torch
    from umpr_tpu.train.checkpoint import save_pytree

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    features, classifier = [], []
    conv_indices = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("features") and "weight" in k})
    for i in conv_indices:
        w = sd[f"features.{i}.weight"].numpy()      # (O, I, 3, 3)
        b = sd[f"features.{i}.bias"].numpy()
        features.append({"kernel": np.transpose(w, (2, 3, 1, 0)).copy(),
                         "bias": b.copy()})
    for i in (0, 3, 6):
        w = sd[f"classifier.{i}.weight"].numpy()    # (O, I)
        b = sd[f"classifier.{i}.bias"].numpy()
        classifier.append({"kernel": w.T.copy(), "bias": b.copy()})

    params = {"features": features, "classifier": classifier}
    save_pytree(out_dir, params)
    print(f"Converted {len(features)} convs + {len(classifier)} linears -> {out_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--pth", required=True, help="torchvision vgg16 .pth state_dict")
    parser.add_argument("--out", required=True, help="output checkpoint dir")
    args = parser.parse_args()
    convert(args.pth, args.out)
