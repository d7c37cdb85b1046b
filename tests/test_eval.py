"""Harness accounting parity (SURVEY.md §4 item 3): warmup iterator restart,
acc/throughput denominators, max_batches cutoff — against a synthetic
in-memory dataset."""

import numpy as np

from rajni_tpu.eval import evaluate_model


class CountingLoader:
    """Re-iterable synthetic (images, labels) loader that counts iterations."""

    def __init__(self, num_batches=4, batch=8, num_classes=10, correct_every=2):
        self.num_batches = num_batches
        self.batch = batch
        self.num_classes = num_classes
        self.correct_every = correct_every
        self.iter_starts = 0
        self.batches_served = 0

    def __len__(self):
        return self.num_batches

    def __iter__(self):
        self.iter_starts += 1
        for b in range(self.num_batches):
            labels = np.arange(self.batch) % self.num_classes
            # Encode the true label into the image so a linear "model" can be
            # exactly right or wrong per sample: sample j is classified
            # correctly iff j % correct_every == 0.
            images = np.zeros((self.batch, self.num_classes), np.float32)
            for j in range(self.batch):
                target = labels[j] if j % self.correct_every == 0 else (
                    (labels[j] + 1) % self.num_classes
                )
                images[j, target] = 1.0
            self.batches_served += 1
            yield images, labels


def identity_model(x):
    return x  # logits are the one-hot planted in the images


def test_accuracy_and_counts():
    loader = CountingLoader(num_batches=4, batch=8, correct_every=2)
    acc, tput = evaluate_model(
        identity_model, loader, warmup=0, progress=False
    )
    assert acc == 50.0  # every second sample correct
    assert tput > 0


def test_warmup_restarts_iterator():
    """warmup > len(loader) must restart the iterator (reference
    eval.py:20-26) and then run the timed loop on a fresh pass."""
    loader = CountingLoader(num_batches=2)
    acc, _ = evaluate_model(
        identity_model, loader, warmup=3, progress=False, max_batches=2
    )
    # warmup consumed 2 + (restart) 1; timed loop a fresh full pass
    assert loader.iter_starts == 3
    assert loader.batches_served == 2 + 1 + 2


def test_max_batches_cutoff():
    loader = CountingLoader(num_batches=5, batch=4)
    calls = []

    def counting_model(x):
        calls.append(x.shape)
        return identity_model(x)

    evaluate_model(
        counting_model, loader, warmup=0, progress=False, max_batches=2,
        prefetch=0,
    )
    # the timed loop must stop after exactly max_batches forwards
    # (reference eval.py:45-46); the loader may be drained further only by
    # the prefetcher (disabled here)
    assert len(calls) == 2


def test_empty_loader_denominators():
    """acc denominator max(total, 1) and throughput denominator
    max(total_time, 1e-6) must not divide by zero (reference eval.py:73-74)."""

    class Empty:
        def __iter__(self):
            return iter(())

        def __len__(self):
            return 0

    acc, tput = evaluate_model(identity_model, Empty(), warmup=0, progress=False)
    assert acc == 0.0
    assert tput == 0.0


def test_partial_final_batch_padded_not_recompiled(rng):
    """The trailing partial batch is padded to the first batch's shape (one
    compiled program) and only real images are counted."""
    import jax.numpy as jnp

    from rajni_tpu.eval import evaluate_model

    shapes_seen = set()

    def model(x):
        shapes_seen.add(tuple(x.shape))
        # "correct" prediction = 1 for every row
        return jnp.stack([jnp.zeros(x.shape[0]), jnp.ones(x.shape[0])], -1)

    class Loader:
        def __iter__(self):
            yield (rng.standard_normal((8, 4, 4, 3)).astype(np.float32),
                   np.ones(8, np.int64))
            yield (rng.standard_normal((3, 4, 4, 3)).astype(np.float32),
                   np.ones(3, np.int64))

    acc, tput = evaluate_model(model, Loader(), warmup=0, progress=False)
    assert shapes_seen == {(8, 4, 4, 3)}  # single compiled shape
    assert acc == 100.0  # 11 real images, all "correct"; padding not counted


def test_warmup_batches_padded(rng):
    """Warmup batches go through the same padding as the timed loop, so a
    tiny dataset's partial batch never compiles a second program during
    warmup (VERDICT r1 weak #7)."""
    import jax.numpy as jnp

    shapes_seen = []

    def model(x):
        shapes_seen.append(tuple(x.shape))
        return jnp.zeros((x.shape[0], 2))

    class Loader:
        def __iter__(self):
            yield (rng.standard_normal((8, 4, 4, 3)).astype(np.float32),
                   np.zeros(8, np.int64))
            yield (rng.standard_normal((3, 4, 4, 3)).astype(np.float32),
                   np.zeros(3, np.int64))

    evaluate_model(model, Loader(), warmup=2, progress=False, max_batches=0)
    assert set(shapes_seen) == {(8, 4, 4, 3)}


def test_batch_divisor_named_sharding():
    """_batch_divisor reads the data-axis size off a NamedSharding so DP
    batches are padded to a splittable size before device_put (ADVICE r1)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rajni_tpu.eval import _batch_divisor
    from rajni_tpu.parallel.mesh import make_mesh

    assert _batch_divisor(jax.devices()[0]) == 1
    mesh = make_mesh(jax.devices(), model=1)
    assert _batch_divisor(NamedSharding(mesh, P("data"))) == len(jax.devices())
    assert _batch_divisor(NamedSharding(mesh, P(None, "data"))) == 1


def test_dp_partial_batch_placed_untimed():
    """A batch size that doesn't divide the data axis must still be padded
    and placed by the prefetcher — never falling back to host arrays (which
    would move the H2D inside the timed region, ADVICE r1)."""
    import jax

    from rajni_tpu.eval import _prefetch_to_device
    from rajni_tpu.parallel.mesh import batch_sharding, make_mesh

    n = len(jax.devices())
    mesh = make_mesh(jax.devices(), model=1)
    sharding = batch_sharding(mesh)

    def gen():
        yield np.zeros((n + 1, 4, 4, 3), np.float32), np.zeros(n + 1)
        yield np.zeros((3, 4, 4, 3), np.float32), np.zeros(3)

    for images_dev, _labels in _prefetch_to_device(gen(), sharding):
        assert isinstance(images_dev, jax.Array)  # placed, not host fallback
        assert images_dev.shape[0] % n == 0
