"""The generic classification trainer learns and keeps the reference's
observability contract (video_action_recognition.py:26-75 tag names)."""

import json

import numpy as np
import optax

from tubelet_transformer_tpu.train import classify
from tubelet_transformer_tpu.utils import MetricsWriter


def _data(rng, n_batches=6, bs=4):
    """Two linearly separable 'video' classes (mean-shifted noise)."""
    batches = []
    for _ in range(n_batches):
        labels = rng.integers(0, 2, size=(bs,))
        clips = rng.normal(0, 1, (bs, 4, 16, 16, 3)).astype(np.float32)
        clips += labels[:, None, None, None, None].astype(np.float32) * 1.5
        batches.append({"clips": clips, "labels": labels.astype(np.int32)})
    return batches


def test_classification_trainer_learns_and_logs(rng, tmp_path):
    model = classify.VideoClassifier(backbone_name="CSN-TINY", num_classes=2)
    tx = optax.adamw(1e-3)
    import jax
    batches = _data(rng)
    state = classify.create_classifier_state(
        model, jax.random.PRNGKey(0), batches[0]["clips"], tx)
    step = classify.make_classification_train_step(model, tx)

    writer = MetricsWriter(str(tmp_path), enabled=True)
    first_losses, last_losses = [], []
    base_iter = 0
    for epoch in range(4):
        base_iter, state = classify.train_classification(
            base_iter, state, step, batches, epoch, display_freq=3,
            lr_fn=lambda it: 1e-3, writer=writer)
    # learning signal: rerun the loss on a fixed batch
    logits = model.apply({"params": state.params,
                          "batch_stats": state.batch_stats},
                         batches[0]["clips"], train=False)
    acc = (np.argmax(np.asarray(logits), -1) ==
           batches[0]["labels"]).mean()
    assert acc >= 0.75, f"classifier failed to learn: acc={acc}"
    assert base_iter == 4 * len(batches)

    writer.close()
    logged = [json.loads(l) for l in
              open(tmp_path / "metrics.jsonl")]
    tags = {r["tag"] for r in logged}
    assert {"train_loss_iteration", "train_batch_size_iteration",
            "learning_rate"} <= tags
