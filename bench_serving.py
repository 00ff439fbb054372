"""Serving benchmark: incremental (step-at-a-time) fusion latency/throughput.

MultiModN's signature serving property is granular real-time feedback: as a
modality arrives, advance the state and read every decoder. This measures
the InferenceSession step on the real chip at the MIMIC flagship shape:

  - end_to_end_step_ms: one session.step() call as a user experiences it
    here — dominated by the axon tunnel's ~30 ms dispatch+fetch round trip,
    reported for honesty, NOT a device property.
  - device_step_us: amortized on-device time per (encoder step + all
    decoder reads), measured by chaining K steps inside one jitted scan.
  - batch throughput: states advanced per second at serving batch sizes.

Writes bench_serving.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402

from multimodn_tpu import MultiModN                          # noqa: E402
from multimodn_tpu.decoders import MLPDecoder                # noqa: E402
from multimodn_tpu.encoders import MIMICMLPEncoder           # noqa: E402
from multimodn_tpu.serving import InferenceSession           # noqa: E402

WIDTHS = [10, 1024, 768, 99]
STATE = 50
HIDDEN = (32, 32)


def fetch(x):
    return float(np.asarray(x).ravel()[0])


def build():
    model = MultiModN(
        STATE,
        [MIMICMLPEncoder(STATE, w, HIDDEN, dropout=0.0) for w in WIDTHS],
        [MLPDecoder(STATE, HIDDEN, 2)], 1.0, 0.0)
    return model


def end_to_end_step(model, batch):
    session = InferenceSession(model)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, WIDTHS[1])).astype(np.float32)
    state = session.init(batch)
    state, probs = session.step(state, 1, x)        # compile
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        state, probs = session.step(state, 1, x)
        times.append(time.perf_counter() - t0)
    return round(float(np.median(times)) * 1e3, 2)


def device_step(model, batch, iters=2000):
    """Amortized on-device cost of one encoder step + all decoder reads."""
    encoder = model.encoders[1]
    decoders = model.decoders
    enc_params = model.params["encoders"][1]
    dec_params = model.params["decoders"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, WIDTHS[1])).astype(np.float32))
    state0 = model.init_state.apply(model.params["init_state"], batch, 0)

    @jax.jit
    def loop(enc_params, dec_params, state, x):
        def body(state, _):
            new = encoder.apply(enc_params, state, x)
            has_nan = jnp.any(jnp.isnan(x), axis=1)
            new = jnp.where(has_nan[:, None], state, new)
            outs = [dec.apply(dec_params[d], new)
                    for d, dec in enumerate(decoders)]
            # feed a decoder-dependent ripple back so nothing hoists/DCEs
            new = new + outs[0][:, :1] * 1e-30
            return new, ()
        state, _ = jax.lax.scan(body, state, None, length=iters)
        return jnp.sum(state)

    fetch(loop(enc_params, dec_params, state0, x))   # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(loop(enc_params, dec_params, state0, x))
        times.append(time.perf_counter() - t0)
    per_step_us = float(np.median(times)) / iters * 1e6
    return round(per_step_us, 2), round(batch / (per_step_us / 1e6), 0)


def main():
    model = build()
    out = {"config": {"widths": WIDTHS, "state": STATE, "hidden": HIDDEN}}
    out["end_to_end_step_ms_b1"] = end_to_end_step(model, 1)
    print("e2e b1:", out["end_to_end_step_ms_b1"], "ms", flush=True)
    for batch in (1, 256):
        us, sps = device_step(model, batch)
        out[f"device_step_us_b{batch}"] = us
        out[f"device_states_per_sec_b{batch}"] = sps
        print(f"device b{batch}: {us} us/step, {sps:.0f} states/s",
              flush=True)
    with open(os.path.join(REPO, "bench_serving.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
