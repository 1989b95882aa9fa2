import jax.numpy as jnp
import numpy as np
import pytest

from lcasr_tpu.ops.ctc import ctc_loss, wctc_loss


def _random_case(rng, B=3, T=20, C=8, Umax=6):
    logits = rng.normal(size=(B, T, C)).astype(np.float32)
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    label_lengths = rng.integers(1, Umax, size=B)
    input_lengths = rng.integers(Umax * 2, T + 1, size=B)
    labels = np.zeros((B, Umax), np.int64)
    for b in range(B):
        # labels exclude the blank id (last class)
        labels[b, : label_lengths[b]] = rng.integers(0, C - 1, size=label_lengths[b])
    return log_probs, labels, input_lengths, label_lengths


def test_ctc_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    log_probs, labels, input_lengths, label_lengths = _random_case(rng)
    C = log_probs.shape[-1]

    ours = ctc_loss(
        jnp.asarray(log_probs),
        jnp.asarray(labels),
        jnp.asarray(input_lengths),
        jnp.asarray(label_lengths),
        reduction="none",
    )

    t_fn = torch.nn.CTCLoss(blank=C - 1, reduction="none")
    theirs = t_fn(
        torch.from_numpy(log_probs).transpose(0, 1),  # (T, B, C)
        torch.from_numpy(labels),
        torch.from_numpy(input_lengths),
        torch.from_numpy(label_lengths),
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-4)


def test_ctc_sum_reduction_matches_reference_usage():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    log_probs, labels, input_lengths, label_lengths = _random_case(rng, B=2, T=32, C=12)
    C = log_probs.shape[-1]
    ours = float(
        ctc_loss(
            jnp.asarray(log_probs),
            jnp.asarray(labels),
            jnp.asarray(input_lengths),
            jnp.asarray(label_lengths),
        )
    )
    t_fn = torch.nn.CTCLoss(blank=C - 1, reduction="sum")
    theirs = float(
        t_fn(
            torch.from_numpy(log_probs).transpose(0, 1),
            torch.from_numpy(labels),
            torch.from_numpy(input_lengths),
            torch.from_numpy(label_lengths),
        )
    )
    assert abs(ours - theirs) / abs(theirs) < 1e-4


def test_ctc_perfect_prediction_low_loss():
    # log-probs peaked exactly on [a, blank, b] for labels [a, b] → small loss
    C, T = 5, 3
    blank = C - 1
    lp = np.full((1, T, C), -20.0, np.float32)
    lp[0, 0, 1] = 0.0
    lp[0, 1, blank] = 0.0
    lp[0, 2, 2] = 0.0
    loss = float(
        ctc_loss(
            jnp.asarray(lp),
            jnp.asarray([[1, 2]]),
            jnp.asarray([3]),
            jnp.asarray([2]),
        )
    )
    assert loss < 1e-3


def test_ctc_gradients_flow():
    import jax

    rng = np.random.default_rng(2)
    log_probs, labels, input_lengths, label_lengths = _random_case(rng, B=2, T=16, C=6)

    def loss_fn(lp):
        return ctc_loss(
            lp,
            jnp.asarray(labels),
            jnp.asarray(input_lengths),
            jnp.asarray(label_lengths),
        )

    g = jax.grad(loss_fn)(jnp.asarray(log_probs))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_wctc_leq_ctc():
    """Wildcard CTC marginalizes more paths → likelihood ≥ CTC → loss ≤ CTC."""
    rng = np.random.default_rng(3)
    log_probs, labels, input_lengths, label_lengths = _random_case(rng, B=4)
    a = np.asarray(
        ctc_loss(
            jnp.asarray(log_probs),
            jnp.asarray(labels),
            jnp.asarray(input_lengths),
            jnp.asarray(label_lengths),
            reduction="none",
        )
    )
    b = np.asarray(
        wctc_loss(
            jnp.asarray(log_probs),
            jnp.asarray(labels),
            jnp.asarray(input_lengths),
            jnp.asarray(label_lengths),
            reduction="none",
        )
    )
    assert (b <= a + 1e-4).all()


def test_ctc_zero_input_length_is_infinite_loss():
    """input_length==0 with a nonempty label is an impossible alignment →
    +inf-ish loss, not a finite emissions[0] artifact (ADVICE r1 low)."""
    import jax.numpy as jnp
    import numpy as np
    from lcasr_tpu.ops.ctc import ctc_loss

    rng = np.random.default_rng(0)
    lp = jnp.asarray(
        np.log(rng.dirichlet(np.ones(5), size=(1, 8)).astype(np.float32))
    )
    labels = jnp.array([[1, 2]], jnp.int32)
    nll = ctc_loss(lp, labels, jnp.array([0]), jnp.array([2]), reduction="none")
    assert float(nll[0]) > 1e20


def test_ctc_analytic_gradient_matches_autodiff():
    """The custom-VJP backward (beta recursion, exact Graves gradient) vs
    autodiff through the plain alpha recursion, with ragged input/label
    lengths and random cotangents.  Impossible alignments (T too short) are
    excluded here — the analytic backward intentionally returns EXACT ZEROS
    for them (autodiff emits junk through the -1e30 arithmetic; torch emits
    inf/nan) — and covered in the dedicated assertion below."""
    import jax
    from lcasr_tpu.ops.ctc import _ctc_alpha_single

    rng = np.random.default_rng(5)
    B, T, C, U = 3, 24, 7, 5
    log_probs = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32), -1
    )
    labels = jnp.asarray(rng.integers(0, C - 1, size=(B, U)), jnp.int32)
    il = jnp.array([T, T - 5, T - 1], jnp.int32)
    ul = jnp.array([U, U - 2, 0], jnp.int32)
    w = jnp.asarray(rng.normal(size=(B,)), jnp.float32)

    def nll_auto(lp):
        return (
            jax.vmap(_ctc_alpha_single, in_axes=(0, 0, 0, 0, None))(
                lp, labels, il, ul, C - 1
            )
            * w
        ).sum()

    def nll_custom(lp):
        return (ctc_loss(lp, labels, il, ul, reduction="none") * w).sum()

    ga = jax.grad(nll_auto)(log_probs)
    gc = jax.grad(nll_custom)(log_probs)
    assert float(jnp.abs(ga - gc).max()) < 1e-4

    # impossible alignment → zero gradient, no NaN
    il_bad = jnp.array([3, 0, T], jnp.int32)
    g_bad = jax.grad(
        lambda lp: ctc_loss(lp, labels, il_bad, jnp.array([U, 2, 0]), reduction="sum")
    )(log_probs)
    assert np.isfinite(np.asarray(g_bad)).all()
    assert np.abs(np.asarray(g_bad[0])).max() == 0.0
    assert np.abs(np.asarray(g_bad[1])).max() == 0.0


@pytest.mark.slow  # fast-tier budget: heavy system test, slow tier runs it
def test_ctc_segmented_matches_monolithic():
    """Segmented backward (segment-entry checkpoints + per-segment alpha
    recompute) vs the monolithic analytic backward: identical losses and
    gradients, including T not divisible by K, ragged input/label lengths,
    an empty label, and an impossible alignment (exact-zero grads)."""
    import jax

    rng = np.random.default_rng(11)
    B, T, C, U = 4, 37, 9, 6
    log_probs = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32), -1
    )
    labels = jnp.asarray(rng.integers(0, C - 1, size=(B, U)), jnp.int32)
    il = jnp.array([T, T - 7, T - 1, 5], jnp.int32)  # last: impossible (2U+? > 5)
    ul = jnp.array([U, U - 2, 0, U], jnp.int32)
    w = jnp.asarray(rng.normal(size=(B,)), jnp.float32)

    def loss(lp, seg):
        return (
            ctc_loss(lp, labels, il, ul, reduction="none", segment_size=seg) * w
        ).sum()

    for K in (8, 16, 64):  # 37 % 8 != 0; 64 > T (single segment)
        nll_mono = ctc_loss(log_probs, labels, il, ul, reduction="none")
        nll_seg = ctc_loss(
            log_probs, labels, il, ul, reduction="none", segment_size=K
        )
        np.testing.assert_allclose(
            np.asarray(nll_seg), np.asarray(nll_mono), rtol=1e-6, atol=1e-6
        )
        g_mono = jax.grad(lambda lp: loss(lp, None))(log_probs)
        g_seg = jax.grad(lambda lp: loss(lp, K))(log_probs)
        assert np.isfinite(np.asarray(g_seg)).all()
        np.testing.assert_allclose(
            np.asarray(g_seg), np.asarray(g_mono), rtol=1e-5, atol=1e-6
        )
    # impossible alignment row got exactly-zero grads in both paths
    assert np.abs(np.asarray(g_seg[3])).max() == 0.0


def test_ctc_segmented_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(12)
    log_probs, labels, input_lengths, label_lengths = _random_case(rng, T=26)
    C = log_probs.shape[-1]
    ours = ctc_loss(
        jnp.asarray(log_probs),
        jnp.asarray(labels),
        jnp.asarray(input_lengths),
        jnp.asarray(label_lengths),
        reduction="none",
        segment_size=7,
    )
    t_fn = torch.nn.CTCLoss(blank=C - 1, reduction="none")
    theirs = t_fn(
        torch.from_numpy(log_probs).transpose(0, 1),
        torch.from_numpy(labels),
        torch.from_numpy(input_lengths),
        torch.from_numpy(label_lengths),
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["soft", "max_prob", "sum_prob"])
def test_wctc_matches_reference_oracle(mode):
    """wctc_loss vs the reference lcasr/losses/wctc.py run as a torch
    oracle: wildcard start at any frame, per-time end-state readout, and
    the three distinct modes."""
    from tests.reference_oracle import load_reference_module, reference_available

    if not reference_available():
        pytest.skip("reference checkout not present")
    import torch

    ref = load_reference_module("lcasr/losses/wctc.py", "ref_wctc")

    from lcasr_tpu.ops.ctc import wctc_loss

    rng = np.random.default_rng(0)
    B, T, C, U = 2, 12, 7, 3
    logits = rng.normal(size=(B, T, C)) * 2.0
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    labels = rng.integers(1, C - 1, size=(B, U))
    t_lens = np.array([U, U - 1])
    i_lens = np.array([T, T])
    blank = 0

    got = wctc_loss(
        jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(i_lens),
        jnp.asarray(t_lens), blank_id=blank, mode=mode, reduction="none",
    )
    want = ref.wctc_loss(
        torch.tensor(np.transpose(lp, (1, 0, 2)), dtype=torch.float64),
        torch.tensor(labels), torch.tensor(i_lens), torch.tensor(t_lens),
        blank=blank, mode=mode,
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4,
                               atol=1e-4)


def test_wctc_tolerates_untranscribed_prefix():
    """The canonical wildcard case: frames [x, a, b] with labels [a, b] —
    the untranscribed leading frame is absorbed for ~free (the old
    implementation scored it ~19 nats)."""
    from lcasr_tpu.ops.ctc import wctc_loss

    C, blank = 4, 0
    # near-one-hot frames: x(class 3), a(1), b(2)
    lp = np.full((1, 3, C), -25.0, np.float32)
    for t, c in enumerate((3, 1, 2)):
        lp[0, t, c] = 0.0
    loss = wctc_loss(
        jnp.asarray(lp), jnp.asarray([[1, 2]]), jnp.asarray([3]),
        jnp.asarray([2]), blank_id=blank, mode="soft", reduction="none",
    )
    assert float(loss[0]) < 1.0, float(loss[0])


def test_ctc_mean_reduction_matches_torch():
    """reduction='mean' divides per-sample losses by target length first
    (torch CTCLoss semantics), not a plain batch mean."""
    import torch

    rng = np.random.default_rng(1)
    B, T, C, U = 2, 10, 6, 4
    logits = rng.normal(size=(B, T, C))
    lp = jnp.asarray(logits - np.log(np.exp(logits).sum(-1, keepdims=True)))
    labels = rng.integers(0, C - 1, size=(B, U))
    t_lens = np.array([U, 2])
    i_lens = np.array([T, T])

    got = ctc_loss(lp, jnp.asarray(labels), jnp.asarray(i_lens),
                   jnp.asarray(t_lens), blank_id=C - 1, reduction="mean")
    want = torch.nn.CTCLoss(blank=C - 1, reduction="mean")(
        torch.tensor(np.transpose(np.asarray(lp), (1, 0, 2)), dtype=torch.float64),
        torch.tensor(labels), torch.tensor(i_lens), torch.tensor(t_lens),
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)
