"""Utility tests: metrics vs sklearn, logging, host benchmarking."""

import os

import numpy as np

from qgtc_ppopp22_tpu.utils import (
    Logger,
    f1_score,
    host_bench,
    multilabel_f1,
    write_csv,
    write_json_line,
)


def test_f1_matches_sklearn(rng):
    from sklearn.metrics import f1_score as sk_f1

    y_true = rng.integers(0, 5, 500)
    y_pred = rng.integers(0, 5, 500)
    for avg in ("micro", "macro"):
        ours = f1_score(y_true, y_pred, num_classes=5, average=avg)
        theirs = sk_f1(y_true, y_pred, average=avg)
        assert abs(ours - theirs) < 1e-9, (avg, ours, theirs)


def test_multilabel_f1_matches_sklearn(rng):
    from sklearn.metrics import f1_score as sk_f1

    logits = rng.standard_normal((200, 7)).astype(np.float32)
    labels = (rng.random((200, 7)) < 0.3).astype(np.int64)
    for avg in ("micro", "macro"):
        ours = multilabel_f1(logits, labels, average=avg)
        theirs = sk_f1(
            labels, (logits > 0).astype(np.int64), average=avg,
            zero_division=0,
        )
        assert abs(ours - theirs) < 1e-9, (avg, ours, theirs)


def test_logger_and_csv(tmp_path):
    log = Logger(str(tmp_path / "run.log"))
    log.write("hello")
    log.write("world")
    lines = open(tmp_path / "run.log").read().strip().splitlines()
    assert len(lines) == 2 and lines[0].endswith("hello")

    rows = [dict(a=1, b="x"), dict(a=2, b="y")]
    write_csv(str(tmp_path / "out.csv"), rows, ["a", "b"])
    content = open(tmp_path / "out.csv").read().strip().splitlines()
    assert content[0] == "a,b" and len(content) == 3

    line = write_json_line(str(tmp_path / "out.jsonl"), dict(m=1.5))
    assert '"m": 1.5' in line
    assert os.path.exists(tmp_path / "out.jsonl")


def test_host_bench_runs():
    import jax.numpy as jnp

    t = host_bench(lambda x: x + 1, (jnp.zeros((8, 128)),), iters=3)
    assert t > 0
