"""Chunk-glue infrastructure tests: capture-free contract, host hints,
working-set budgets (models/base.py, utils/hosthints.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

import opencorr_tpu as oc
from opencorr_tpu.models import base
from opencorr_tpu.utils import hosthints


def test_chunked_rejects_device_array_capture():
    """Closure-captured device arrays are read back to host at jit lowering
    (embedding them as program constants), which poisons dispatch latency
    under the axon tunnel — chunked() must refuse them outright."""
    xs32 = np.arange(32, dtype=np.float32)
    table = oc.new_table_2d(xs32, xs32)
    dev = jnp.ones((4,), jnp.float32)

    def run(t):
        return t.replace(x=t.x + dev[0])

    with pytest.raises(TypeError, match="captures a device array"):
        base.chunked(run, table, 8)

    def run_default(t, d=dev):
        return t.replace(x=t.x + d[0])

    with pytest.raises(TypeError, match="default is a device array"):
        base.chunked(run_default, table, 8)

    # the direct path (n <= chunk) intentionally skips the check: no glue
    # program is traced over the closure there
    out = base.chunked(run, table, 64)
    assert np.allclose(np.asarray(out.x), np.arange(32) + 1.0)


def test_chunked_consts_channel_equivalent():
    """consts ride every chunk whole; result must equal the unchunked run."""
    table = oc.new_table_2d(np.arange(50, dtype=np.float32),
                            np.zeros(50, np.float32))
    scale = jnp.float32(3.0)

    def run(t, s):
        return t.replace(x=t.x * s)

    a = base.chunked(run, table, None, consts=(scale,))
    b = base.chunked(run, table, 16, consts=(scale,))
    assert np.allclose(np.asarray(a.x), np.asarray(b.x))


def test_host_hints_registry():
    host = np.arange(5, dtype=np.float32)
    dev = jnp.asarray(host)
    hosthints.register_host_hint(dev, host)
    assert hosthints.host_hint(dev) is host
    other = jnp.asarray(host)
    assert hosthints.host_hint(other) is None


def test_new_table_registers_coordinate_hints():
    xs = np.arange(10, dtype=np.float32)
    t = oc.new_table_2d(xs, xs + 1)
    hx = hosthints.host_hint(t.x)
    assert hx is not None and np.allclose(hx, xs)
    # same-buffer device inputs pass through with their hint intact
    t2 = oc.new_table_2d(t.x, t.y)
    assert t2.x is t.x and hosthints.host_hint(t2.x) is hx
    # derived device arrays register nothing (value unknown on host)
    t3 = oc.new_table_2d(t.x * 2.0, t.y)
    assert hosthints.host_hint(t3.x) is None


def test_chunked_carries_hints_across_glue():
    xs = np.arange(64, dtype=np.float32)
    t = oc.new_table_2d(xs, xs)

    def run(tc):
        return tc.replace(p=tc.p + 1.0)

    out = base.chunked(run, t, 16)
    assert out.x is not t.x  # glue rebuilt the buffer...
    hx = hosthints.host_hint(out.x)
    assert hx is not None and np.allclose(hx, xs)  # ...hint carried over


def test_budget_chunk():
    assert base.budget_chunk(None, 16, 16) is None
    # 30k r=16 flagship: one dispatch (budget above 30000*1089)
    assert base.budget_chunk(65536, 16, 16) >= 30000
    # utn r=30: split well below the user cap
    c30 = base.budget_chunk(65536, 30, 30)
    assert 1024 <= c30 < 16384
    assert c30 * 61 * 61 <= 40_000_000


def test_chunk_canary_detects_corrupt_chunk(monkeypatch):
    """With OPENCORR_TPU_CANARY_EVERY=1, a chunk whose result carries a
    non-finite first-field value (the observable of a silent device fault)
    must raise mid-run with the chunk count, not at the final readback."""
    monkeypatch.setenv("OPENCORR_TPU_CANARY_EVERY", "1")
    xs = np.arange(32, dtype=np.float32)
    table = oc.new_table_2d(xs, xs)

    def run(t):
        # corrupt exactly the chunk containing x == 20 (chunk 3 of 4)
        bad = jnp.any((t.x >= 16) & (t.x < 24))
        return t.replace(x=jnp.where(bad, jnp.float32(np.nan), t.x))

    with pytest.raises(RuntimeError, match="chunk canary.*3 chunk"):
        base.chunked(run, table, 8)

    # clean runs pass through the canary untouched
    def ok_run(t):
        return t.replace(x=t.x + 1.0)

    out = base.chunked(ok_run, table, 8)
    np.testing.assert_allclose(np.asarray(out.x), xs + 1.0)
