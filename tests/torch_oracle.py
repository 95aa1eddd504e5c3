"""Test-only REAL-torch oracles for parity testing.

These modules replicate the reference's module structure and state_dict
naming (torchvision resnet18 under `model`, pairwise MLP under `fc` —
reference models/net.py:25-66) so that

  * the torch<->flax checkpoint converters can be validated against real
    torch state_dicts (tests/test_checkpoint.py), and
  * training dynamics (loss, gradients, optimizer updates, BN running
    stats) can be compared step-for-step against torch autograd + torch.optim
    (tests/test_torch_training_parity.py).

torchvision itself is not installed; the backbone here reproduces its
resnet18 graph exactly (verified by the strict state_dict load test).
"""

import torch
import torch.nn as tnn


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class TorchResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cfg = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        for i, (cin, cout, stride) in enumerate(cfg, start=1):
            setattr(
                self,
                f"layer{i}",
                tnn.Sequential(
                    TorchBasicBlock(cin, cout, stride), TorchBasicBlock(cout, cout, 1)
                ),
            )
        self.avgpool = tnn.AdaptiveAvgPool2d(1)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return torch.flatten(self.avgpool(x), 1)


class TorchTripletNet(tnn.Module):
    """Reference models/net.py:25-66 contract: backbone under `model`,
    pairwise MLP under `fc` (Sequential indices 0, 2)."""

    def __init__(self):
        super().__init__()
        self.model = TorchResNet18()
        self.fc = tnn.Sequential(tnn.Linear(1024, 512), tnn.ReLU(True), tnn.Linear(512, 256))

    def forward(self, i1, i2, i3):
        e1, e2, e3 = self.model(i1), self.model(i2), self.model(i3)
        f12 = self.fc(torch.cat((e1, e2), 1))
        f23 = self.fc(torch.cat((e2, e3), 1))
        f13 = self.fc(torch.cat((e1, e3), 1))
        return torch.cat((f12, f23, f13), 1)

    def encode_single(self, x):
        """Single-image features, encode-once-and-tile (the math of the
        reference TripletNet_Finetune forward, net.py:86-103 — which encodes
        the SAME image three times; identical encodings make the tiled
        version bit-equal, see test_reference_3x_encode_equivalence)."""
        e = self.model(x)
        f = self.fc(torch.cat((e, e), 1))
        return torch.cat((f, f, f), 1)

    def forward_3x(self, x):
        """The literal reference TripletNet_Finetune forward (net.py:86-103):
        three separate backbone passes over the same image.  In train mode
        this updates every BN running stat 3x per step."""
        return self.forward(x, x, x)


class TorchClassifier(tnn.Module):
    """Reference pretrain Classifier (models/net.py:8-20):
    Linear(in,128) -> ReLU -> Linear(128, num_classes)."""

    def __init__(self, in_features, num_classes):
        super().__init__()
        self.classifier = tnn.Sequential(
            tnn.Linear(in_features, 128), tnn.ReLU(True), tnn.Linear(128, num_classes)
        )

    def forward(self, x):
        return self.classifier(x)


class TorchFinetuneHead(tnn.Module):
    """Reference FinetuneResNet (models/net.py:107-115): one Linear."""

    def __init__(self, in_features, num_classes):
        super().__init__()
        self.classifier = tnn.Sequential(tnn.Linear(in_features, num_classes))

    def forward(self, x):
        return self.classifier(x)


class LookaheadOracle:
    """Per-step Lookahead wrapper with the reference's update rule
    (models/optimiser/RAdam/lookahead.py:81-106, pullback_momentum='none'):
    after every inner step the counter increments; when it reaches
    ``la_steps`` the fast weights are pulled toward the cached slow copy,
    p <- alpha * p + (1 - alpha) * slow, and the slow copy recaches.

    Independent re-implementation from the algorithm (Zhang et al. 2019) for
    oracle use only — applied per STEP here; the reference drivers invoke it
    once per EPOCH (bound as `scheduler`), which `lookahead_epoch_sync`
    models and test_lookahead_epoch_sync_matches_reference_rule verifies.
    """

    def __init__(self, optimizer, la_steps=5, la_alpha=0.5):
        self.optimizer = optimizer
        self.la_steps = la_steps
        self.la_alpha = la_alpha
        self.count = 0
        self.slow = [
            [p.detach().clone() for p in g["params"]] for g in optimizer.param_groups
        ]

    def zero_grad(self):
        self.optimizer.zero_grad()

    @torch.no_grad()
    def step(self):
        self.optimizer.step()
        self.count += 1
        if self.count >= self.la_steps:
            self.count = 0
            for group, slows in zip(self.optimizer.param_groups, self.slow):
                for p, s in zip(group["params"], slows):
                    p.mul_(self.la_alpha).add_(s, alpha=1.0 - self.la_alpha)
                    s.copy_(p)
