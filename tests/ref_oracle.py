"""Test oracle: run the actual reference implementation (/root/reference)
with weights copied from our params, on the same batch.

The reference environment lacks torchvision and gensim, so minimal stand-ins
are installed before importing reference modules:
- gensim: empty module (only referenced by the reference's unused code path);
- torchvision.models.vgg16: a faithful torch implementation of the VGG16-D
  architecture (the structure torchvision builds), with random weights --
  parity tests copy OUR weights into it, so pretrained values are irrelevant.

``patch_improved_rnn()`` replaces the reference's ImprovedRnn.forward with a
version minus the double-unsort bug at reference model.py:21 (pad_packed
already restores original order; the extra ``result[unsorted_indices]``
scrambles rows across the flattened batch whenever lengths differ).  Our
implementation fixes that bug, so the bug-fixed oracle is the comparison
target; a separate equal-lengths test runs the UNPATCHED reference, where the
quirk is a no-op.
"""

import sys
import types

import numpy as np
import torch
from torch import nn

REF = "/root/reference"


# Image edge length the fake torchvision VGG16 is built for.  224 IS
# torchvision (AdaptiveAvgPool2d(7) is an identity on the 7x7 feature map);
# smaller multiples of 32 shrink the first classifier Linear the same way
# umpr_tpu.models.visual_net.init_vgg16(img_size=...) does, so reduced-size
# parity runs (e.g. the full-UMPR training-dynamics comparison, whose torch
# side is CPU-bound) compare identical architectures.
FAKE_VGG_IMG_SIZE = 224


def _fake_torchvision():
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")

    def vgg16(pretrained=False, num_classes=1000, **kw):
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, in_ch = [], 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(in_ch, v, 3, padding=1), nn.ReLU(inplace=True)]
                in_ch = v
        s = FAKE_VGG_IMG_SIZE // 32  # five 2x2 pools
        class VGG(nn.Module):
            def __init__(self):
                super().__init__()
                self.features = nn.Sequential(*layers)
                self.avgpool = nn.AdaptiveAvgPool2d((s, s))
                self.classifier = nn.Sequential(
                    nn.Linear(512 * s * s, 4096), nn.ReLU(True), nn.Dropout(),
                    nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
                    nn.Linear(4096, num_classes))
            def forward(self, x):
                x = self.features(x)
                x = self.avgpool(x)
                x = torch.flatten(x, 1)
                return self.classifier(x)
        return VGG()

    models.vgg16 = vgg16
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models


def import_reference_model():
    sys.modules.setdefault("gensim", types.ModuleType("gensim"))
    if "torchvision" not in sys.modules:
        _fake_torchvision()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import src.model as ref_model  # noqa
    return ref_model


def patch_improved_rnn(ref_model):
    """Fix the double-unsort bug in the oracle (reference model.py:21)."""
    def forward(self, data, lengths):
        bf = self.module.batch_first
        max_len = data.shape[1]
        package = nn.utils.rnn.pack_padded_sequence(
            data, lengths.cpu(), batch_first=bf, enforce_sorted=False)
        result, hidden = self.module(package)
        result, _ = nn.utils.rnn.pad_packed_sequence(
            result, batch_first=bf, total_length=max_len)
        return result, hidden
    ref_model.ImprovedRnn.forward = forward


# ---------------------------------------------------------------- weights
def _t(x):
    return torch.tensor(np.asarray(x))


def load_gru(torch_gru: nn.Module, p):
    sd = {
        "weight_ih_l0": _t(p["fwd"]["w_ih"]).T.contiguous(),
        "weight_hh_l0": _t(p["fwd"]["w_hh"]).T.contiguous(),
        "bias_ih_l0": _t(p["fwd"]["bias_ih"]),
        "bias_hh_l0": _t(p["fwd"]["bias_hh"]),
        "weight_ih_l0_reverse": _t(p["bwd"]["w_ih"]).T.contiguous(),
        "weight_hh_l0_reverse": _t(p["bwd"]["w_hh"]).T.contiguous(),
        "bias_ih_l0_reverse": _t(p["bwd"]["bias_ih"]),
        "bias_hh_l0_reverse": _t(p["bwd"]["bias_hh"]),
    }
    torch_gru.load_state_dict(sd)


def load_linear(torch_linear: nn.Linear, p):
    torch_linear.weight.data = _t(p["kernel"]).T.contiguous()
    if "bias" in p:
        torch_linear.bias.data = _t(p["bias"])


def load_umpr(ref, params, config):
    """Build a reference UMPR and load our params into it."""
    model = ref.UMPR(config, np.asarray(params["embedding"]))
    rn, ref_rn = params["review_net"], model.review_net
    load_gru(ref_rn.r_net.gru.module, rn["rnet"]["gru"])
    ref_rn.r_net.M.data = _t(rn["rnet"]["M"])
    for name in ("u", "i"):
        sn = getattr(ref_rn, f"s_net_{name}")
        sn.Ms.data = _t(rn[f"snet_{name}"]["Ms"])
        sn.Ws.data = _t(rn[f"snet_{name}"]["Ws"])
        load_linear(getattr(ref_rn, f"linear_{name}"), rn[f"linear_{name}"])
    load_linear(model.linear_fusion[0], params["linear_fusion"])

    if not config.review_net_only:
        cn, ref_cn = params["control_net"], model.control_net
        load_gru(ref_cn.c_net.gru.module, cn["cnet"]["gru"])
        conv = ref_cn.c_net.cnn[0]
        conv.weight.data = _t(cn["cnet"]["conv"]["kernel"]).permute(2, 1, 0).contiguous()
        conv.bias.data = _t(cn["cnet"]["conv"]["bias"])
        load_linear(ref_cn.c_net.linear[0], cn["cnet"]["linear"])
        ref_cn.s_net.Ms.data = _t(cn["snet"]["Ms"])
        ref_cn.s_net.Ws.data = _t(cn["snet"]["Ws"])
        load_linear(ref_cn.ss_net.linear[0], cn["ssnet"]["linear"])

        vn, ref_vn = params["visual_net"], model.visual_net
        vgg = ref_vn.vgg16[0]
        convs = [m for m in vgg.features if isinstance(m, nn.Conv2d)]
        for m, p in zip(convs, vn["vgg16"]["features"]):
            m.weight.data = _t(p["kernel"]).permute(3, 2, 0, 1).contiguous()  # HWIO->OIHW
            m.bias.data = _t(p["bias"])
        lins = [m for m in vgg.classifier if isinstance(m, nn.Linear)]
        for m, p in zip(lins, vn["vgg16"]["classifier"]):
            load_linear(m, p)
        ref_vn.pos_v_emb.data = _t(vn["pos_v_emb"])
        ref_vn.neg_v_emb.data = _t(vn["neg_v_emb"])
        load_linear(ref_vn.linear, vn["linear"])
    return model


# ---------------------------------------------------------------- batches
def batch_to_reference(batch):
    """Our static-shape batch -> the reference's dynamically padded tensors
    (sliced to the runtime batch maxima, photos to NCHW /255 floats)."""
    Sb = int(max(batch["u_counts"].max(), batch["i_counts"].max()))
    Lb = int(max(batch["u_lengths"].max(), batch["i_lengths"].max()))
    S_ui = int(batch["ui_counts"].max())
    L_ui = int(batch["ui_lengths"].max())
    args = [
        torch.tensor(batch["u_tokens"][:, :Sb, :Lb].astype(np.int64)),
        torch.tensor(batch["i_tokens"][:, :Sb, :Lb].astype(np.int64)),
        torch.tensor(batch["ui_tokens"][:, :S_ui, :L_ui].astype(np.int64)),
        torch.tensor(batch["u_lengths"][:, :Sb].astype(np.int64)),
        torch.tensor(batch["i_lengths"][:, :Sb].astype(np.int64)),
        torch.tensor(batch["ui_lengths"][:, :S_ui].astype(np.int64)),
    ]
    if "photos" in batch:
        ph = batch["photos"].astype(np.float32) / 255.0  # (B,V,P,H,W,3)
        ph = np.transpose(ph, (0, 1, 2, 5, 3, 4))  # -> (B,V,P,3,H,W)
        args.append(torch.tensor(ph))
    else:
        b = batch["u_tokens"].shape[0]
        args.append(torch.zeros(b, 1, 1, 3, 8, 8))
    args.append(torch.tensor(batch["ratings"]))
    return args


def make_reference_optimizer(model, lr, weight_decay, lr_decay=0.99):
    """The reference's exact optimizer setup (main.py:16-19): Adam with L2
    on non-bias params only, exponential per-epoch lr decay.  Shared by the
    trajectory-parity drivers (tools/dynamics_parity.py, tools/
    scale_parity.py) so the protocol can't silently fork between them."""
    opt = torch.optim.Adam([
        {"params": [p for n, p in model.named_parameters()
                    if "bias" not in n and p.requires_grad]},
        {"params": [p for n, p in model.named_parameters()
                    if "bias" in n and p.requires_grad], "weight_decay": 0.0},
    ], lr, weight_decay=weight_decay)
    sch = torch.optim.lr_scheduler.ExponentialLR(opt, lr_decay)
    return opt, sch


def reference_dataset_mse(model, batches):
    """Dataset MSE through the reference model (its evaluate_mse semantics,
    src/evaluate.py:6-14: sum of squared errors / sample count).  `batches`
    yields OUR loader dicts (pad_to_full=False)."""
    model.eval()
    tot, cnt = 0.0, 0
    with torch.no_grad():
        for b in batches:
            pred, _ = model(*batch_to_reference(b))
            tot += float(((pred - torch.tensor(b["ratings"])) ** 2).sum())
            cnt += len(b["ratings"])
    return tot / cnt


class RefConfig:
    """Minimal stand-in for the reference Config object."""
    def __init__(self, **kw):
        self.review_net_only = False
        self.loss_v_rate = 0.1
        self.gru_size = 64
        self.self_atte_size = 64
        self.kernel_count = 120
        self.kernel_size = 3
        self.threshold = 0.35
        self.views = ["unknown"]
        for k, v in kw.items():
            setattr(self, k, v)


def random_batch(rng, B=4, S=6, L=12, S_ui=3, V=1, P=1, vocab=40, emb=16,
                 with_photos=False, img=32, max_count=None, max_len=None,
                 equal_lengths=False):
    """A synthetic batch with realistic invariants (pad sentences length 1,
    counts >= 1, real sentence lengths >= 6)."""
    max_count = max_count or S
    max_len = max_len or L

    def reviews(S_, min_count=1, max_count_=None):
        max_count_ = max_count_ or max_count
        counts = rng.integers(min_count, min(max_count_, S_) + 1, size=B)
        tokens = np.zeros((B, S_, L), np.int32)
        lengths = np.ones((B, S_), np.int32)
        for b in range(B):
            for s in range(counts[b]):
                ln = max_len if equal_lengths else int(rng.integers(6, max_len + 1))
                tokens[b, s, :ln] = rng.integers(3, vocab, size=ln)
                lengths[b, s] = ln
        return tokens, lengths, counts.astype(np.int32)

    u_tok, u_len, u_cnt = reviews(S)
    i_tok, i_len, i_cnt = reviews(S)
    ui_tok, ui_len, ui_cnt = reviews(S_ui)
    if equal_lengths:
        u_cnt[:] = S; i_cnt[:] = S; ui_cnt[:] = S_ui
        u_len[:] = max_len; i_len[:] = max_len; ui_len[:] = max_len
        for tok in (u_tok, i_tok, ui_tok):
            tok[:] = rng.integers(3, vocab, size=tok.shape)
    batch = {
        "u_tokens": u_tok, "u_lengths": u_len, "u_counts": u_cnt,
        "i_tokens": i_tok, "i_lengths": i_len, "i_counts": i_cnt,
        "ui_tokens": ui_tok, "ui_lengths": ui_len, "ui_counts": ui_cnt,
        "ratings": rng.uniform(1, 5, size=B).astype(np.float32),
        "sample_mask": np.ones(B, np.float32),
    }
    if with_photos:
        batch["photos"] = rng.integers(0, 256, size=(B, V, P, img, img, 3)).astype(np.uint8)
    return batch
