"""Coverage extras: ResNet1DConv training path, call weights computation."""

import numpy as np

from orcai_tpu.io.dataset import SnippetDataLoader
from orcai_tpu.models import build_model
from orcai_tpu.parallel.mesh import make_mesh
from orcai_tpu.pipeline.snippets import get_call_weights
from orcai_tpu.train.trainer import Trainer, make_optimizer


def test_resnet_1dconv_trains():
    param = {
        "name": "c1d",
        "architecture": "ResNet1DConv",
        "model": {
            "filters": [2, 3],
            "kernel_size": 3,
            "dropout_rate": 0.1,
        },
        "calls": ["A", "B"],
    }
    model = build_model(param)
    trainer = Trainer(model, make_optimizer(1e-2), mesh=make_mesh(n_data=1))
    state = trainer.init_state((16, 9, 1), seed=0)
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(8, 16, 9, 1)).astype(np.float32)
    y = rng.integers(0, 2, size=(8, 4, 2)).astype(np.float32)
    state, m0 = trainer.run_train_epoch(state, [(x, y)])
    for _ in range(5):
        state, m = trainer.run_train_epoch(state, [(x, y)])
    assert m["loss"] < m0["loss"]


class _FakeLoader:
    """Yields (spec, label) pairs like SnippetDataLoader."""

    def __init__(self, labels):
        self.labels = labels

    def __len__(self):
        return len(self.labels)

    def __iter__(self):
        for y in self.labels:
            yield np.zeros((4, 3, 1), np.float32), y


def test_get_call_weights_methods():
    # call A present 3x as often as B
    labels = [
        np.array([[1.0, 0.0], [1.0, 1.0], [1.0, 0.0]], np.float32)
        for _ in range(4)
    ]
    loader = _FakeLoader(labels)

    uniform = get_call_weights(loader, ["A", "B"], method="uniform")
    assert uniform == {"A": 1.0, "B": 1.0}

    balanced = get_call_weights(loader, ["A", "B"], method="balanced")
    # counts: A=12, B=4 -> total 16; balanced = 16 / (2 * count)
    assert balanced["A"] == 16 / 24
    assert balanced["B"] == 16 / 8

    mx = get_call_weights(loader, ["A", "B"], method="max")
    assert mx["A"] == 1.0 and mx["B"] == 3.0

    try:
        get_call_weights(loader, ["A", "B"], method="bogus")
        assert False
    except ValueError:
        pass


def test_warmup_bucket_sample_counts():
    """One representative length per frame bucket, covering the max length."""
    from orcai_tpu.ops.frontend import _bucket_frames
    from orcai_tpu.tools.warmup import bucket_sample_counts

    sr, hop = 48000, 256
    counts = bucket_sample_counts(90.0, sr, hop)
    buckets = [_bucket_frames(1 + n // hop) for n in counts]
    assert len(set(buckets)) == len(buckets)  # distinct buckets
    assert sorted(buckets) == buckets
    # the longest requested recording maps to the last bucket
    assert buckets[-1] == _bucket_frames(1 + int(90 * 60 * sr) // hop)
    # every count is representable within its bucket
    for n, b in zip(counts, buckets):
        assert 1 + n // hop <= b
