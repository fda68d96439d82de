"""Regressions for the round-3 self-review fixes (optimizer schedule edge
cases, prefetcher shutdown, kenlm bucket precision, watch_step memory,
metric sufficient-statistics)."""

import numpy as np

import jax
import jax.numpy as jnp

from rnntransducer_tpu.config import TrainConfig


def test_onecycle_finite_at_zero_warmup_and_tiny_runs():
    """warmup_ratio=0 used to make optax divide by int(N*0.0)=0 -> every LR
    of the run NaN; tiny max_steps used to stretch the schedule far past the
    run.  Now: finite everywhere, >=1 warmup step, completes within the run."""
    from rnntransducer_tpu.train.optim import onecycle_schedule

    for ratio, steps in ((0.0, 100), (0.0, 3), (0.0, 1), (0.02, 3),
                         (0.1, 100), (1.0, 10)):
        s = onecycle_schedule(TrainConfig(max_steps=steps, warmup_ratio=ratio,
                                          learning_rate=1e-3))
        vals = np.asarray([float(s(i)) for i in range(max(steps, 2))])
        assert np.all(np.isfinite(vals)), (ratio, steps, vals)
        assert vals.max() <= 1e-3 + 1e-9
    # the decay phase finishes inside the run (no stretching): final lr is
    # peak/ (div_factor*final_div_factor)-ish, far below peak
    s = onecycle_schedule(TrainConfig(max_steps=100, warmup_ratio=0.0,
                                      learning_rate=1e-3))
    assert float(s(99)) < 1e-5


def test_prefetcher_close_releases_worker():
    """Abandoning a DevicePrefetcher mid-iteration used to leave the worker
    blocked in Queue.put forever (pinning device batches); close() must
    terminate it."""
    import itertools
    import time

    from rnntransducer_tpu.data.prefetch import DevicePrefetcher

    def slow_batches():
        for i in itertools.count():
            yield {"x": np.full((4,), i, np.float32)}

    pf = DevicePrefetcher(slow_batches(), size=2)
    first = next(pf)
    assert float(first["x"][0]) == 0.0
    # worker is now blocked in put() with a full queue; abandon + close
    pf.close()
    deadline = time.time() + 5
    while pf._thread.is_alive() and time.time() < deadline:
        time.sleep(0.02)
    assert not pf._thread.is_alive()


def test_kenlm_buckets_match_float32_reader():
    """Bucket counts must be computed in float32 like real kenlm and the C++
    reader (native/ngram_lm.cpp KenlmBuckets) — double math diverges by one
    slot once entries exceed float32's integer spacing."""
    from rnntransducer_tpu.utils.kenlm_binary import _buckets

    for entries in (1, 100, 10_000_001, 16_777_217, 33_554_433):
        for mult in (1.5, 2.0):
            want = max(entries + 1,
                       int(np.float32(mult) * np.float32(entries)))
            assert _buckets(entries, mult) == want, (entries, mult)
    # the exact divergence case: double gives 15000001, float32 gives
    # 15000002 — the reader's layout wins
    assert _buckets(10_000_001, 1.5) == int(np.float32(1.5) *
                                            np.float32(10_000_001))
    assert _buckets(10_000_001, 1.5) != int(1.5 * 10_000_001)


def test_watch_step_slices_one_microbatch_under_accum():
    """With accumulate_grad_batches=N, watch_step must histogram ONE
    microbatch (train_step scans microbatches, so grads over the full batch
    would need N x the activation memory)."""
    import dataclasses

    import rnntransducer_tpu as rt
    from rnntransducer_tpu.train.state import TrainState, watch_step

    cfg = rt.tiny_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, accumulate_grad_batches=4, precision="fp32"))
    state = TrainState.create(cfg)
    B, T, U = 8, 16, 4
    rng = np.random.RandomState(0)
    batch = {
        "feats": jnp.asarray(rng.randn(B, T, 80), jnp.float32),
        "feat_lengths": jnp.full((B,), T, jnp.int32),
        "text_in": jnp.zeros((B, U + 1), jnp.int32),
        "text_lengths": jnp.full((B,), U + 1, jnp.int32),
        "targets": jnp.ones((B, U), jnp.int32),
        "target_lengths": jnp.full((B,), U, jnp.int32),
    }
    hists = watch_step(cfg, state.params, batch, jax.random.PRNGKey(0))
    counts, _ = next(iter(hists["grads"].values()))
    assert int(jnp.sum(counts)) > 0  # well-formed
    # equivalence: grads over exactly the first B//accum rows
    micro = jax.tree.map(lambda a: a[: B // 4], batch)
    cfg1 = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, accumulate_grad_batches=1))
    hists1 = watch_step(cfg1, state.params, micro, jax.random.PRNGKey(0))
    for (n, (c, e)), (n1, (c1, e1)) in zip(sorted(hists["grads"].items()),
                                           sorted(hists1["grads"].items())):
        assert n == n1
        np.testing.assert_array_equal(np.asarray(c), np.asarray(c1))


def test_error_counts_are_sufficient_statistics():
    from rnntransducer_tpu.train.metrics import (
        char_error_rate, error_counts, word_error_rate,
    )

    preds = ["ab c", "xyz", ""]
    refs = ["ab d", "xy", "q"]
    we, wt, ce, ct = error_counts(preds, refs)
    assert word_error_rate(preds, refs) == we / wt
    assert char_error_rate(preds, refs) == ce / ct
    # splitting the corpus and summing counts == whole-corpus rates
    w1 = error_counts(preds[:1], refs[:1])
    w2 = error_counts(preds[1:], refs[1:])
    assert tuple(a + b for a, b in zip(w1, w2)) == (we, wt, ce, ct)


def test_ngram_order1_state_stays_empty(tmp_path):
    """Order-1 LM state must pin to () — [-0:] kept the whole history and
    grew without bound across a streaming session."""
    from rnntransducer_tpu.decode.ngram_lm import NGramLM

    arpa = tmp_path / "uni.arpa"
    arpa.write_text("\\data\\\nngram 1=3\n\n\\1-grams:\n"
                    "-1.0 a\n-1.2 b\n-2.0 <unk>\n\n\\end\\\n")
    lm = NGramLM.load(str(arpa))
    state = lm.get_start_state()
    for w in ("a", "b", "a", "b", "a"):
        score, state = lm.score(state, w)
        assert np.isfinite(score)
        assert state == (), state
