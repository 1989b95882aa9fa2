import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcasr_tpu.optim.madgrad import madgrad, mirror_madgrad
from lcasr_tpu.optim.scheduling import CosineLRScheduler, SequenceWarmupManager


def _trajectory(opt, params, grads_seq):
    state = opt.init(params)
    out = []
    for g in grads_seq:
        updates, state = opt.update(g, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        out.append(params)
    return out


@pytest.fixture(scope="module")
def torch_reference_madgrad():
    """Optional oracle: the reference repo's vendored MADGRAD (torch CPU).
    Skipped when the read-only reference checkout is not present."""
    torch = pytest.importorskip("torch")
    from tests.reference_oracle import load_reference_module, reference_available

    if not reference_available():
        pytest.skip("reference checkout not present")
    mod = load_reference_module("lcasr/optim/madgrad.py", "ref_madgrad")
    if mod is None:
        pytest.skip("reference madgrad not importable")
    return mod.MADGRAD, mod.MirrorMADGRAD, torch


@pytest.mark.parametrize("which", ["madgrad", "mirror"])
def test_against_reference_trajectory(torch_reference_madgrad, which):
    MADGRAD, MirrorMADGRAD, torch = torch_reference_madgrad
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(5)]
    lr, momentum = 3e-2, 0.9

    # torch reference
    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    t_opt = (MADGRAD if which == "madgrad" else MirrorMADGRAD)(
        [p], lr=lr, momentum=momentum
    )
    t_traj = []
    for g in grads:
        t_opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        t_opt.step()
        t_traj.append(p.detach().numpy().copy())

    # ours
    opt = (madgrad if which == "madgrad" else mirror_madgrad)(
        learning_rate=lr, momentum=momentum
    )
    j_traj = _trajectory(opt, {"w": jnp.asarray(w0)}, [{"w": jnp.asarray(g)} for g in grads])

    for t_p, j_p in zip(t_traj, j_traj):
        np.testing.assert_allclose(np.asarray(j_p["w"]), t_p, rtol=2e-4, atol=2e-5)


def test_madgrad_decreases_quadratic():
    opt = madgrad(learning_rate=0.1, momentum=0.9)
    params = {"w": jnp.asarray([5.0, -3.0])}
    state = opt.init(params)
    loss = lambda p: jnp.sum(p["w"] ** 2)
    l0 = float(loss(params))
    for _ in range(50):
        g = jax.grad(loss)(params)
        updates, state = opt.update(g, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    assert float(loss(params)) < l0 * 0.01


def test_cosine_scheduler_warmup_then_cosine():
    s = CosineLRScheduler(warmup_steps=10, peak_value=1.0, final_value=0.1)
    lrs = [s.step() for _ in range(10)]
    assert lrs[0] == pytest.approx(0.1) and lrs[-1] == pytest.approx(1.0)
    # switch to cosine over recordings, as the trainer does
    s.is_warmup = False
    s.set_cosine_schedule(total_recordings=100, cur_podcast=0)
    lr_start = s.step(epoch=0)
    lr_mid = s.step(epoch=50)
    lr_end = s.step(epoch=100)
    assert lr_start == pytest.approx(1.0, abs=1e-3)
    assert 0.1 < lr_mid < 1.0
    assert lr_end == pytest.approx(0.1, abs=1e-2)


def test_sequence_warmup_doubling_schedule():
    m = SequenceWarmupManager(
        increase_every=100,
        stop_after=10_000,
        start_after=0,
        initial_sequence_length=512,
        initial_batch_size=704,
        max_sequence_length=4096,
    )
    seq_hist = []
    for _ in range(500):
        updated, seq, bs = m.step(steps=1)
        if updated:
            seq_hist.append((seq, bs))
    assert seq_hist == [(1024, 352), (2048, 176), (4096, 88)]
    # capped at max_sequence_length afterwards
    for _ in range(300):
        updated, seq, bs = m.step(steps=1)
        assert seq <= 4096


def test_sequence_warmup_disabled():
    m = SequenceWarmupManager(
        increase_every=-1,
        stop_after=10,
        start_after=0,
        initial_sequence_length=512,
        initial_batch_size=8,
        max_sequence_length=4096,
    )
    assert m.step(steps=100) == (False, 512, 8)


def test_state_roundtrip():
    m = SequenceWarmupManager(
        increase_every=10,
        stop_after=1000,
        start_after=0,
        initial_sequence_length=512,
        initial_batch_size=8,
        max_sequence_length=4096,
    )
    for _ in range(15):
        m.step()
    st = m.state_dict()
    m2 = SequenceWarmupManager(
        increase_every=10,
        stop_after=1000,
        start_after=0,
        initial_sequence_length=1,
        initial_batch_size=1,
        max_sequence_length=4096,
    )
    m2.load_state_dict(st)
    assert m2.cur_sequence_length == m.cur_sequence_length
    assert m2.cur_batch_size == m.cur_batch_size


def test_madgrad_lr_zero_freezes_params():
    """With a warmup schedule starting at lr=0 the first steps must leave
    params EXACTLY frozen — eps is only added when lr != 0 (reference
    madgrad.py:101-102; ADVICE r1 low)."""
    import jax.numpy as jnp
    from lcasr_tpu.optim.madgrad import madgrad, mirror_madgrad

    params = {"w": jnp.ones((4,), jnp.float32)}
    grads = {"w": jnp.full((4,), 0.5, jnp.float32)}
    for opt in (madgrad(learning_rate=0.0, eps=1e-6),
                mirror_madgrad(learning_rate=0.0, eps=1e-6)):
        state = opt.init(params)
        updates, state = opt.update(grads, state, params)
        assert float(jnp.abs(updates["w"]).max()) == 0.0


def test_madgrad_eps_zero_all_zero_grads_no_nan():
    """eps=0 with all-zero gradients must not NaN (rms==0 → inf guard,
    reference madgrad.py:186-187; ADVICE r1 low)."""
    import jax.numpy as jnp
    import numpy as np
    from lcasr_tpu.optim.madgrad import madgrad

    params = {"w": jnp.ones((4,), jnp.float32)}
    grads = {"w": jnp.zeros((4,), jnp.float32)}
    opt = madgrad(learning_rate=1e-3, eps=0.0)
    state = opt.init(params)
    updates, state = opt.update(grads, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()
    assert float(jnp.abs(updates["w"]).max()) == 0.0


def test_madgrad_three_tuple_params_container():
    """A 3-tuple CONTAINER in the params pytree must not be mistaken for a
    per-leaf result triple (that silently scrambled updates/state across
    sibling leaves)."""
    opt = madgrad(learning_rate=0.1, momentum=0.0)
    params = (jnp.ones((2,)), jnp.ones((3,)), jnp.ones((4,)))  # 3-tuple!
    grads = jax.tree.map(jnp.ones_like, params)
    state = opt.init(params)
    updates, state = opt.update(grads, state, params)
    # identical per-leaf inputs → identical per-element updates on EVERY leaf
    vals = [np.unique(np.asarray(u).round(8)) for u in updates]
    assert all(len(v) == 1 for v in vals)
    assert vals[0][0] == vals[1][0] == vals[2][0] != 0.0
    # and the state trees keep the params' structure
    assert jax.tree.structure(state.grad_sum_sq) == jax.tree.structure(params)


def test_mirror_madgrad_three_tuple_params_container():
    opt = mirror_madgrad(learning_rate=0.1, momentum=0.0)
    params = (jnp.ones((2,)), jnp.ones((3,)), jnp.ones((4,)))
    grads = jax.tree.map(jnp.ones_like, params)
    state = opt.init(params)
    updates, _ = opt.update(grads, state, params)
    vals = [np.unique(np.asarray(u).round(8)) for u in updates]
    assert all(len(v) == 1 for v in vals)
    assert vals[0][0] == vals[1][0] == vals[2][0] != 0.0


def test_set_learning_rate_copy_on_write():
    """Mutating the injected LR must not alias into the caller's saved
    pre-update optimizer state (rollback paths)."""
    from lcasr_tpu.optim.factory import build_optimizer, set_learning_rate

    opt = build_optimizer("madgrad", lr=1e-3)
    params = {"w": jnp.ones((2,))}
    st = opt.init(params)

    def find_lr(state):
        if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
            return float(state.hyperparams["learning_rate"])
        if hasattr(state, "inner_state"):
            return find_lr(state.inner_state)
        if isinstance(state, tuple):
            for s in state:
                r = find_lr(s)
                if r is not None:
                    return r
        return None

    st2 = set_learning_rate(st, 0.5)
    assert find_lr(st2) == 0.5
    assert find_lr(st) != 0.5  # the old state is intact
