"""Native parallel .npy reader: exact round trip vs np.load, dtype coverage,
error paths, and dataloader integration (the native path must produce
byte-identical batches to the python path)."""
import numpy as np
import pytest

from lcasr_tpu.native import load_npy_native

npy = load_npy_native()
pytestmark = pytest.mark.skipif(npy is None, reason="native toolchain unavailable")


@pytest.mark.parametrize("dtype", [np.float32, np.float16, np.int32, np.int16, np.uint8])
def test_roundtrip_matches_numpy(tmp_path, dtype):
    rng = np.random.default_rng(0)
    arrs, paths = [], []
    for i, shape in enumerate([(80, 123), (1, 80, 7), (5,), (3, 1, 2, 4)]):
        a = (rng.normal(size=shape) * 10).astype(dtype)
        p = str(tmp_path / f"a{i}.npy")
        np.save(p, a)
        arrs.append(a)
        paths.append(p)
    out = npy.read_npy_batch(paths, 3)
    assert len(out) == len(arrs)
    for got, want in zip(out, arrs):
        assert got.dtype == want.dtype and got.shape == want.shape
        np.testing.assert_array_equal(got, want)


def test_zero_dim_and_large(tmp_path):
    a = np.float32(3.5) * np.ones((), np.float32)
    p0 = str(tmp_path / "scalar.npy")
    np.save(p0, a)
    big = np.arange(80 * 20000, dtype=np.float16).reshape(80, 20000)
    p1 = str(tmp_path / "big.npy")
    np.save(p1, big)
    out = npy.read_npy_batch([p0, p1], 2)
    np.testing.assert_array_equal(out[0], a)
    np.testing.assert_array_equal(out[1], big)


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        npy.read_npy_batch([str(tmp_path / "nope.npy")], 1)


def test_not_npy_raises(tmp_path):
    p = str(tmp_path / "junk.npy")
    open(p, "wb").write(b"not an npy file at all")
    with pytest.raises(ValueError):
        npy.read_npy_batch([p], 1)


def test_fortran_order_rejected(tmp_path):
    a = np.asfortranarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    p = str(tmp_path / "f.npy")
    np.save(p, a)
    with pytest.raises(ValueError):
        npy.read_npy_batch([p], 1)


def test_dataloader_native_path_matches_python(tmp_path):
    """SimpleDataloader with .npy pairs: native batch loads == python loads."""
    import json

    from lcasr_tpu.data.dataloading import SimpleDataloader

    rng = np.random.default_rng(1)
    pairs = {}
    for i in range(5):
        spec = rng.normal(size=(1, 80, 100 + 17 * i)).astype(np.float16)
        ap = str(tmp_path / f"rec{i}.npy")
        np.save(ap, spec)
        tp = str(tmp_path / f"rec{i}.json")
        words = [{"word": f"w{i}", "startTime": "0.0s", "endTime": "1.0s"}]
        json.dump({"results": [{"alternatives": [{"words": words}]}]}, open(tp, "w"))
        pairs[f"rec{i}"] = {"audio": ap, "txt": tp, "duration": 1.0 + i}

    def batches(**kw):
        dl = SimpleDataloader(pairs, tokenizer=None, batch_size=2, prefetch=False, **kw)
        return list(dl._iter_sync())

    native_batches = batches()
    # force the python path by monkeypatching the loader away
    import lcasr_tpu.native as native_mod

    orig = native_mod._cache.pop("npy_native", None)
    native_mod._attempted.add("npy_native")
    try:
        python_batches = batches()
    finally:
        if orig is not None:
            native_mod._cache["npy_native"] = orig
        native_mod._attempted.discard("npy_native")

    assert len(native_batches) == len(python_batches)
    for (a1, l1, t1, i1), (a2, l2, t2, i2) in zip(native_batches, python_batches):
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(l1, l2)
        assert t1 == t2 and i1 == i2
