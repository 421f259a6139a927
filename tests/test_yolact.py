import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amos_slam_tpu.models import yolact as Y
from amos_slam_tpu.models.segmenter import Segmenter


@pytest.fixture(scope="module")
def small_model():
    """Tiny YOLACT (few classes, shallow backbone) for fast CPU tests."""
    model = Y.Yolact(num_classes=5, backbone_layers=(1, 1, 1, 1))
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 128, 128, 3))
    params = model.init(key, x)
    return model, params


def test_forward_shapes(small_model):
    model, params = small_model
    x = jnp.ones((2, 128, 128, 3))
    loc, conf, coef, proto = model.apply(params, x)
    P = loc.shape[1]
    assert loc.shape == (2, P, 4)
    assert conf.shape == (2, P, 5)
    assert coef.shape == (2, P, Y.PROTO_DIM)
    # proto at 1/4 input res (P3 stride 8, upsampled x2)
    assert proto.shape == (2, 32, 32, Y.PROTO_DIM)
    # coefficient range from tanh
    assert float(jnp.abs(coef).max()) <= 1.0


def test_priors_cover_unit_square():
    pr = Y.make_priors(IMG_SIZE := 550)
    assert pr.shape[1] == 4
    assert (pr[:, :2] > 0).all() and (pr[:, :2] < 1).all()
    # 5 levels x 3 anchors: strides 8..128
    expected = sum(
        (-(-550 // (2 ** (l + 3)))) ** 2 * 3 for l in range(5)
    )
    assert len(pr) == expected


def test_decode_identity():
    pr = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
    box = Y.decode_boxes(jnp.zeros((1, 4)), pr)
    np.testing.assert_allclose(np.asarray(box), [[0.4, 0.4, 0.6, 0.6]], atol=1e-6)


def test_fast_nms_suppresses_same_class_overlap():
    """Two heavily overlapping boxes, same class: keep only the stronger.
    A third distant box must survive."""
    P = 16
    priors = np.tile([[0.5, 0.5, 0.2, 0.2]], (P, 1)).astype(np.float32)
    priors[2] = [0.1, 0.1, 0.1, 0.1]
    loc = np.zeros((P, 4), np.float32)
    loc[1] = [0.05, 0.05, 0.0, 0.0]  # slight offset -> big IoU with box 0
    conf = np.full((P, 3), -10.0, np.float32)
    conf[:, 0] = 10.0                 # background everywhere by default
    conf[0] = [-10, 8, -10]           # class 0, strong
    conf[1] = [-10, 6, -10]           # class 0, weaker, overlapping
    conf[2] = [-10, 7, -10]           # class 0, far away
    det = Y.detect(
        jnp.asarray(loc), jnp.asarray(conf), jnp.zeros((P, Y.PROTO_DIM)),
        jnp.asarray(priors), top_k=5, pre_nms=8, conf_th=0.1,
    )
    v = np.asarray(det.valid)
    cls = np.asarray(det.classes)[v]
    boxes = np.asarray(det.boxes)[v]
    assert v.sum() == 2, (v.sum(), np.asarray(det.scores))
    # the two survivors: strong central box + the distant one
    want = np.asarray([[0.05, 0.05, 0.15, 0.15], [0.4, 0.4, 0.6, 0.6]])
    got = boxes[np.argsort(boxes[:, 0])]
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_assemble_masks_crops_to_box():
    proto = jnp.ones((8, 8, Y.PROTO_DIM)) * 0.5
    det = Y.Detections(
        boxes=jnp.asarray([[0.25, 0.25, 0.75, 0.75]]),
        scores=jnp.asarray([0.9]),
        classes=jnp.asarray([0]),
        coefs=jnp.ones((1, Y.PROTO_DIM)),   # sigmoid(16) ~ 1 everywhere
        valid=jnp.asarray([True]),
    )
    m = np.asarray(Y.assemble_masks(proto, det))[0]
    assert m[4, 4]
    assert not m[0, 0] and not m[7, 7]


def test_segmenter_pipeline_shapes():
    """Random weights: validates the full jitted pipeline, not mask quality."""
    seg = Segmenter(num_classes=5, score_th=0.0)
    rgb = np.random.default_rng(0).uniform(0, 255, (96, 128, 3))
    m = seg.person_mask(rgb)
    assert m.shape == (96, 128)
    assert m.dtype == jnp.bool_
    m2 = seg.person_mask(rgb)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m2))


def test_port_torch_mapping_shapes():
    """Build a synthetic torch-style state_dict with the public YOLACT
    names and check it ports into a tree the Flax model accepts."""
    torch = pytest.importorskip("torch")
    from amos_slam_tpu.models.port_torch import port_state_dict

    layers = (1, 1, 1, 1)
    sd = {}

    def conv(name, cout, cin, k):
        sd[f"{name}.weight"] = torch.zeros(cout, cin, k, k)

    def convb(name, cout, cin, k):
        conv(name, cout, cin, k)
        sd[f"{name}.bias"] = torch.zeros(cout)

    def bn(name, c):
        sd[f"{name}.weight"] = torch.ones(c)
        sd[f"{name}.bias"] = torch.zeros(c)
        sd[f"{name}.running_mean"] = torch.zeros(c)
        sd[f"{name}.running_var"] = torch.ones(c)

    conv("backbone.conv1", 64, 3, 7)
    bn("backbone.bn1", 64)
    cin = 64
    planes = 64
    for s in range(4):
        tp = f"backbone.layers.{s}.0"
        conv(f"{tp}.conv1", planes, cin, 1)
        bn(f"{tp}.bn1", planes)
        conv(f"{tp}.conv2", planes, planes, 3)
        bn(f"{tp}.bn2", planes)
        conv(f"{tp}.conv3", planes * 4, planes, 1)
        bn(f"{tp}.bn3", planes * 4)
        conv(f"{tp}.downsample.0", planes * 4, cin, 1)
        bn(f"{tp}.downsample.1", planes * 4)
        cin = planes * 4
        planes *= 2
    for i in range(3):
        convb(f"fpn.lat_layers.{i}", 256, [2048, 1024, 512][i], 1)
        convb(f"fpn.pred_layers.{i}", 256, 256, 3)
    for i in range(2):
        convb(f"fpn.downsample_layers.{i}", 256, 256, 3)
    for idx, (cout, cin2, k) in zip(
        (0, 2, 4, 8, 10),
        [(256, 256, 3), (256, 256, 3), (256, 256, 3), (256, 256, 3),
         (Y.PROTO_DIM, 256, 1)],
    ):
        convb(f"proto_net.{idx}", cout, cin2, k)
    convb("prediction_layers.0.upfeature.0", 256, 256, 3)
    convb("prediction_layers.0.bbox_layer", 12, 256, 3)
    convb("prediction_layers.0.conf_layer", 81 * 3, 256, 3)
    convb("prediction_layers.0.mask_layer", Y.PROTO_DIM * 3, 256, 3)

    params = port_state_dict(sd, layers)
    model = Y.Yolact(num_classes=81, backbone_layers=layers)
    out = model.apply(params, jnp.zeros((1, 128, 128, 3)))
    assert out[0].shape[-1] == 4


def test_backbone_port_matches_torch_numerically():
    """Numerical oracle for the weight port: a torch ResNet stage built with
    the reference's module naming (src/python/backbone.py:60), random
    weights AND random BN running stats, forwarded in eval mode, must agree
    with our Flax backbone after port_torch's mapping -- this pins the
    (out,in,kh,kw)->(kh,kw,in,out) transpose, BN parameter routing, and the
    conv1/maxpool padding conventions, which the shape-only port test
    cannot see."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    from amos_slam_tpu.models.port_torch import _map_backbone
    from amos_slam_tpu.models.resnet import ResNet

    layers = (1, 1, 1, 1)

    class TBottleneck(tnn.Module):
        def __init__(self, cin, planes, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(
                planes, planes, 3, stride=stride, padding=1, bias=False
            )
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )

        def forward(self, x):
            idt = self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = torch.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return torch.relu(y + idt)

    class TBackbone(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
            self.layers = tnn.ModuleList()
            cin, planes = 64, 64
            for s, n in enumerate(layers):
                stage = tnn.ModuleList()
                for b in range(n):
                    stride = 2 if (s > 0 and b == 0) else 1
                    stage.append(TBottleneck(cin, planes, stride))
                    cin = planes * 4
                self.layers.append(stage)
                planes *= 2

        def forward(self, x):
            y = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            outs = []
            for stage in self.layers:
                for blk in stage:
                    y = blk(y)
                outs.append(y)
            return outs

    torch.manual_seed(0)
    tb = TBackbone().eval()
    # randomize BN running stats so the test can't pass with identity BN
    with torch.no_grad():
        for m in tb.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)

    x = np.random.default_rng(1).normal(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        t_outs = [o.numpy() for o in tb(torch.from_numpy(x))]

    sd = {k: v.numpy() for k, v in tb.state_dict().items()}
    params = {"params": _map_backbone(sd, "", layers)}
    j_outs = ResNet(layers).apply(
        params, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
    )
    for t, j in zip(t_outs, j_outs):
        np.testing.assert_allclose(
            np.transpose(np.asarray(j), (0, 3, 1, 2)), t, atol=2e-4, rtol=1e-3
        )


def test_full_net_port_matches_torch_numerically():
    """Whole-forward numerical oracle for the weight port: a torch twin of
    the reference's full YOLACT graph (backbone + FPN + ProtoNet + shared
    prediction head, module names exactly as in the reference's
    src/python/yolact.py state_dict) with random weights and BN stats must
    agree with our Flax Yolact after port_state_dict. Pins the FPN lateral
    REVERSED-order pairing, bilinear upsample convention
    (align_corners=False), ProtoNet sequential indices (0,2,4,8,10),
    tanh mask-coefficient activation, and the (B,C,H,W)->(B,HW*a,·)
    reshape order of every head output."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    import torch.nn.functional as tF
    from amos_slam_tpu.models.port_torch import port_state_dict
    from amos_slam_tpu.models import yolact as Y

    layers = (1, 1, 1, 1)
    C = 11  # num_classes incl. background
    A = len(Y.ASPECT_RATIOS)

    class TBottleneck(tnn.Module):
        def __init__(self, cin, planes, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(
                planes, planes, 3, stride=stride, padding=1, bias=False
            )
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )

        def forward(self, x):
            idt = self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = torch.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return torch.relu(y + idt)

    class TBackbone(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
            self.layers = tnn.ModuleList()
            cin, planes = 64, 64
            for s, n in enumerate(layers):
                stage = tnn.ModuleList()
                for b in range(n):
                    stride = 2 if (s > 0 and b == 0) else 1
                    stage.append(TBottleneck(cin, planes, stride))
                    cin = planes * 4
                self.layers.append(stage)
                planes *= 2

        def forward(self, x):
            y = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            outs = []
            for stage in self.layers:
                for blk in stage:
                    y = blk(y)
                outs.append(y)
            return outs  # c2, c3, c4, c5

    def up(x, like):
        return tF.interpolate(
            x, size=like.shape[-2:], mode="bilinear", align_corners=False
        )

    class TYolact(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = TBackbone()
            # reference FPN (yolact.py:265): lat_layers applied to C5..C3
            # in REVERSED order -> lat_layers.0 pairs with C5
            self.fpn = tnn.Module()
            self.fpn.lat_layers = tnn.ModuleList(
                [tnn.Conv2d(c, 256, 1) for c in (2048, 1024, 512)]
            )
            self.fpn.pred_layers = tnn.ModuleList(
                [tnn.Conv2d(256, 256, 3, padding=1) for _ in range(3)]
            )
            self.fpn.downsample_layers = tnn.ModuleList(
                [tnn.Conv2d(256, 256, 3, stride=2, padding=1) for _ in range(2)]
            )
            # reference make_net proto sequential: conv/relu x3,
            # interpolate(x2)/relu, conv/relu, 1x1 conv (no last relu)
            self.proto_net = tnn.Sequential(
                tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
                tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
                tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
                tnn.Upsample(scale_factor=2, mode="bilinear",
                             align_corners=False), tnn.ReLU(),
                tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
                tnn.Conv2d(256, Y.PROTO_DIM, 1),
            )
            self.prediction_layers = tnn.ModuleList()
            head = tnn.Module()
            head.upfeature = tnn.Sequential(
                tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU()
            )
            head.bbox_layer = tnn.Conv2d(256, 4 * A, 3, padding=1)
            head.conf_layer = tnn.Conv2d(256, C * A, 3, padding=1)
            head.mask_layer = tnn.Conv2d(256, Y.PROTO_DIM * A, 3, padding=1)
            self.prediction_layers.append(head)

        def forward(self, x):
            _, c3, c4, c5 = self.backbone(x)
            lat = self.fpn.lat_layers
            p5 = lat[0](c5)
            p4 = lat[1](c4) + up(p5, c4)
            p3 = lat[2](c3) + up(p4, c3)
            pred = self.fpn.pred_layers
            p5 = torch.relu(pred[0](p5))
            p4 = torch.relu(pred[1](p4))
            p3 = torch.relu(pred[2](p3))
            p6 = self.fpn.downsample_layers[0](p5)
            p7 = self.fpn.downsample_layers[1](p6)
            proto = torch.relu(self.proto_net(p3))
            head = self.prediction_layers[0]
            locs, confs, coefs = [], [], []
            for p in (p3, p4, p5, p6, p7):
                y = head.upfeature(p)
                B = y.shape[0]
                locs.append(
                    head.bbox_layer(y).permute(0, 2, 3, 1).reshape(B, -1, 4)
                )
                confs.append(
                    head.conf_layer(y).permute(0, 2, 3, 1).reshape(B, -1, C)
                )
                coefs.append(
                    torch.tanh(head.mask_layer(y))
                    .permute(0, 2, 3, 1).reshape(B, -1, Y.PROTO_DIM)
                )
            return (
                torch.cat(locs, 1), torch.cat(confs, 1), torch.cat(coefs, 1),
                proto.permute(0, 2, 3, 1),
            )

    torch.manual_seed(0)
    tm = TYolact().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)

    x = np.random.default_rng(2).normal(0, 1, (1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        t_loc, t_conf, t_coef, t_proto = [o.numpy() for o in tm(torch.from_numpy(x))]

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = port_state_dict(sd, layers)
    model = Y.Yolact(num_classes=C, backbone_layers=layers)
    j_loc, j_conf, j_coef, j_proto = model.apply(
        params, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
    )
    for t, j, name in (
        (t_loc, j_loc, "loc"), (t_conf, j_conf, "conf"),
        (t_coef, j_coef, "coef"), (t_proto, j_proto, "proto"),
    ):
        t, j = np.asarray(t), np.asarray(j)
        denom = max(np.abs(t).max(), 1e-3)
        rel = np.abs(j - t).max() / denom
        assert rel < 1e-2, f"{name}: rel err {rel:.2e}"
