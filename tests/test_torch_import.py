"""Torch checkpoint import + forward parity.

Builds a miniature torch model with the reference's exact module naming
(Focus stem → Darknet Sequential groups → PAFPN → YOLOX head), imports its
state_dict into the flax model via train/checkpoints.import_torch_checkpoint,
and checks the two forwards agree — the mechanism that makes released
FRLW-EvD .pth checkpoints reproduce their mAP.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from frlw_evd_tpu.models import build_detector
from frlw_evd_tpu.train.checkpoints import default_rename, import_torch_checkpoint

CH = 16          # tiny widths for CPU speed
H, W, C_IN = 64, 64, 4
NUM_CLASSES = 2


# -- torch twin with the reference's naming scheme --------------------------

class TBaseConv(tnn.Module):
    def __init__(self, cin, cout, k, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, (k - 1) // 2, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.nn.functional.silu(self.bn(self.conv(x)))


class TFocus(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TBaseConv(cin * 4, cout, 3)

    def forward(self, x):
        tl = x[..., ::2, ::2]
        tr = x[..., ::2, 1::2]
        bl = x[..., 1::2, ::2]
        br = x[..., 1::2, 1::2]
        return self.conv(torch.cat((tl, bl, tr, br), 1))


class TRes(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.layer1 = TBaseConv(ch, ch // 2, 1)
        self.layer2 = TBaseConv(ch // 2, ch, 3)

    def forward(self, x):
        return x + self.layer2(self.layer1(x))


class TSPP(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        hidden = cin // 2
        self.conv1 = TBaseConv(cin, hidden, 1)
        self.m = tnn.ModuleList([tnn.MaxPool2d(k, 1, k // 2)
                                 for k in (5, 9, 13)])
        self.conv2 = TBaseConv(hidden * 4, cout, 1)

    def forward(self, x):
        x = self.conv1(x)
        x = torch.cat([x] + [m(x) for m in self.m], 1)
        return self.conv2(x)


class TBottleneck(tnn.Module):
    def __init__(self, cin, cout, shortcut):
        super().__init__()
        self.conv1 = TBaseConv(cin, cout, 1)
        self.conv2 = TBaseConv(cout, cout, 3)
        self.add = shortcut and cin == cout

    def forward(self, x):
        y = self.conv2(self.conv1(x))
        return x + y if self.add else y


class TCSP(tnn.Module):
    def __init__(self, cin, cout, n=1, shortcut=False):
        super().__init__()
        hidden = cout // 2
        self.conv1 = TBaseConv(cin, hidden, 1)
        self.conv2 = TBaseConv(cin, hidden, 1)
        self.conv3 = TBaseConv(2 * hidden, cout, 1)
        self.m = tnn.Sequential(*[TBottleneck(hidden, hidden, shortcut)
                                  for _ in range(n)])

    def forward(self, x):
        x1 = self.m(self.conv1(x))
        return self.conv3(torch.cat((x1, self.conv2(x)), 1))


class TBackbone(tnn.Module):
    def __init__(self):
        super().__init__()
        base = CH
        self.stem = TFocus(C_IN, base)
        self.dark2 = tnn.Sequential(TBaseConv(base, base * 2, 3, 2),
                                    TRes(base * 2))
        self.dark3 = tnn.Sequential(TBaseConv(base * 2, CH * 2, 3, 2),
                                    TRes(CH * 2), TRes(CH * 2))
        self.dark4 = tnn.Sequential(TBaseConv(CH * 2, CH * 2, 3, 2),
                                    TRes(CH * 2), TRes(CH * 2))
        self.dark5 = tnn.Sequential(
            TBaseConv(CH * 2, CH * 2, 3, 2), TRes(CH * 2),
            TBaseConv(CH * 2, CH * 2, 1), TBaseConv(CH * 2, CH * 2, 3),
            TSPP(CH * 2, CH * 2), TBaseConv(CH * 2, CH * 2, 3),
            TBaseConv(CH * 2, CH * 2, 1))

    def forward(self, x):
        x = self.stem(x)
        x = self.dark2(x)
        d3 = self.dark3(x)
        d4 = self.dark4(d3)
        d5 = self.dark5(d4)
        return d3, d4, d5


class TNeck(tnn.Module):
    def __init__(self):
        super().__init__()
        c = CH * 2
        self.upsample = tnn.Upsample(scale_factor=2, mode="nearest")
        self.lateral_conv0 = TBaseConv(c, c, 1)
        self.C3_p4 = TCSP(2 * c, c)
        self.reduce_conv1 = TBaseConv(c, c, 1)
        self.C3_p3 = TCSP(2 * c, c)
        self.bu_conv2 = TBaseConv(c, c, 3, 2)
        self.C3_n3 = TCSP(2 * c, c)
        self.bu_conv1 = TBaseConv(c, c, 3, 2)
        self.C3_n4 = TCSP(2 * c, c)

    def forward(self, feats):
        x2, x1, x0 = feats
        fpn0 = self.lateral_conv0(x0)
        f0 = self.C3_p4(torch.cat([self.upsample(fpn0), x1], 1))
        fpn1 = self.reduce_conv1(f0)
        p2 = self.C3_p3(torch.cat([self.upsample(fpn1), x2], 1))
        p1 = self.C3_n3(torch.cat([self.bu_conv2(p2), fpn1], 1))
        p0 = self.C3_n4(torch.cat([self.bu_conv1(p1), fpn0], 1))
        return p2, p1, p0


class THead(tnn.Module):
    def __init__(self):
        super().__init__()
        c = CH * 2
        self.stems = tnn.ModuleList()
        self.cls_convs = tnn.ModuleList()
        self.reg_convs = tnn.ModuleList()
        self.cls_preds = tnn.ModuleList()
        self.reg_preds = tnn.ModuleList()
        self.obj_preds = tnn.ModuleList()
        for _ in range(3):
            self.stems.append(TBaseConv(c, c, 1))
            self.cls_convs.append(tnn.Sequential(TBaseConv(c, c, 3),
                                                 TBaseConv(c, c, 3)))
            self.reg_convs.append(tnn.Sequential(TBaseConv(c, c, 3),
                                                 TBaseConv(c, c, 3)))
            self.cls_preds.append(tnn.Conv2d(c, NUM_CLASSES, 1))
            self.reg_preds.append(tnn.Conv2d(c, 4, 1))
            self.obj_preds.append(tnn.Conv2d(c, 1, 1))

    def forward(self, feats):
        outs = []
        for k, x in enumerate(feats):
            x = self.stems[k](x)
            cls_feat = self.cls_convs[k](x)
            reg_feat = self.reg_convs[k](x)
            outs.append(torch.cat([self.reg_preds[k](reg_feat),
                                   self.obj_preds[k](reg_feat),
                                   self.cls_preds[k](cls_feat)], 1))
        return outs


class TModel(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TBackbone()
        self.neck = TNeck()
        self.head = THead()

    def forward(self, x):
        return self.head(self.neck(self.backbone(x)))


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    torch.manual_seed(0)
    tmodel = TModel().eval()
    # exercise BN running stats so they're non-trivial
    with torch.no_grad():
        for _ in range(3):
            tmodel.train()(torch.randn(2, C_IN, H, W))
    tmodel.eval()
    path = tmp_path_factory.mktemp("pth") / "ckpt.pth"
    torch.save({"state_dict": {"module." + k: v for k, v in
                               tmodel.state_dict().items()},
                "epoch": 7}, path)

    fmodel = build_detector(NUM_CLASSES, family="aed", stem="focus",
                            in_channels=(CH * 2,) * 3, stem_out_channels=CH,
                            head_width=CH * 2)
    x = jnp.zeros((1, H, W, C_IN), jnp.float32)
    variables = jax.jit(fmodel.init, static_argnums=(2,))(
        jax.random.key(0), x, False)
    return tmodel, str(path), fmodel, variables


def test_import_covers_all_keys(models):
    tmodel, path, fmodel, variables = models
    params, bs, report = import_torch_checkpoint(
        path, variables["params"], variables["batch_stats"])
    sd = tmodel.state_dict()
    n_mappable = sum(1 for k in sd if not k.endswith("num_batches_tracked"))
    assert report["loaded"] == n_mappable, report["unmatched"][:8]
    assert report["unmatched"] == []


def test_forward_parity_after_import(models):
    tmodel, path, fmodel, variables = models
    params, bs, report = import_torch_checkpoint(
        path, variables["params"], variables["batch_stats"])

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, C_IN, H, W)).astype(np.float32)
    with torch.no_grad():
        t_outs = tmodel(torch.from_numpy(x))
    f_outs = jax.jit(lambda v, xx: fmodel.apply(v, xx, False))(
        {"params": params, "batch_stats": bs},
        jnp.asarray(x.transpose(0, 2, 3, 1)))

    for t, f in zip(t_outs, f_outs):
        # torch NCHW [reg(4), obj(1), cls(C)] vs flax NHWC same channel order
        t_np = t.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(f), t_np, atol=2e-4, rtol=1e-3)
