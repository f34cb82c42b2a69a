"""XSpace trace reader: wire-format decode of a real jax.profiler capture."""

import glob

import numpy as np

import jax
import jax.numpy as jnp

from act3d_tpu.utils.xplane import op_self_times, parse_message


def test_parse_real_trace(tmp_path, rng):
    x = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    f = jax.jit(lambda a: jnp.tanh(a @ a).sum())
    jax.block_until_ready(f(x))
    jax.profiler.start_trace(str(tmp_path))
    for _ in range(3):
        out = f(x)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    paths = glob.glob(f"{tmp_path}/**/*.xplane.pb", recursive=True)
    assert paths, "no trace written"
    space = parse_message(open(paths[0], "rb").read())
    planes = [
        parse_message(pb).get(2, [b""])[0].decode(errors="replace")
        for pb in space.get(1, [])
    ]
    assert any("CPU" in p or "TPU" in p for p in planes), planes

    # op timings on the host plane (CPU backend in tests)
    totals = op_self_times(paths[0], plane_filter="")
    assert isinstance(totals, dict)


def test_parse_message_wire_types():
    # varint field 1 = 150; length-delimited field 2 = b"abc"
    buf = bytes([0x08, 0x96, 0x01, 0x12, 0x03]) + b"abc"
    fields = parse_message(buf)
    assert fields[1] == [150]
    assert fields[2] == [b"abc"]
