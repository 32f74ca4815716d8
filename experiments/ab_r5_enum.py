"""Enumerate-formulation A/B at hg38 production shapes.

ab_r5_locdecomp measured enumerate_range_positions at 242 ms of the
1.587 s locate_all stage (4M chunk) — pure data movement. The repeat
form hides three (capacity,) gathers + two cumsums inside jnp.repeat
(scatter-marks + cumsum + take) plus start[qid] / seg_off[qid]; the
round-5 delta form keeps one scatter + one cumsum + ONE gather
(pos = iota + (start - seg_off)[qid]).

Synthetic ranges are exactly representative here: the phase touches
only (start, end) and never the index — distribution mirrors the hg38
protocol (mostly width-1 ranges, a thin multi-hit tail; capacity
rounded to 64K like bench.py).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from avxwindowfmindex_tpu import search as se

REPS = int(os.environ.get("AWFM_AB_REPS", 7))


def log(m):
    print(f"[enum] {m}", file=sys.stderr, flush=True)


def timed(fn, reps=REPS):
    out = fn()
    float(np.asarray(jnp.sum(out[0])))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        float(np.asarray(jnp.sum(out[0])))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(5)
    res = {}
    for b in (1 << 20, 1 << 22):
        start = rng.integers(0, 3_100_000_000 % (1 << 32), size=b).astype(
            np.uint32
        )
        width = np.ones(b, dtype=np.uint32)
        many = rng.random(b) < 0.004  # thin multi-hit tail like hg38
        width[many] = rng.integers(2, 10, size=int(many.sum()))
        end = start + width - 1
        total = int(width.sum())
        cap = ((total + 65535) // 65536) * 65536
        s = jax.block_until_ready(jnp.asarray(start))
        e = jax.block_until_ready(jnp.asarray(end))
        r = {}
        for mode in ("repeat", "scatter", "delta"):
            if mode == "delta":
                os.environ.pop("AWFM_ENUM", None)
            else:
                os.environ["AWFM_ENUM"] = mode
            r[mode + "_s"] = round(
                timed(
                    lambda: se.enumerate_range_positions(s, e, capacity=cap)
                ),
                4,
            )
        os.environ.pop("AWFM_ENUM", None)
        # parity at full scale (one readback each, compare on device)
        os.environ["AWFM_ENUM"] = "repeat"
        p0, q0, m0 = se.enumerate_range_positions(s, e, capacity=cap)
        os.environ.pop("AWFM_ENUM", None)
        p1, q1, m1 = se.enumerate_range_positions(s, e, capacity=cap)
        mism = int(
            np.asarray(
                jnp.sum(
                    ((p0 != p1) | (q0 != q1) | (m0 != m1)).astype(jnp.uint32)
                )
            )
        )
        assert mism == 0, f"delta != repeat on {mism} slots at B={b}"
        r["parity"] = "ok"
        res[f"B{b>>20}M_cap{cap}"] = r
        log(f"B{b>>20}M: {r}")
    print(json.dumps({"exp": "enum", "res": res}))


if __name__ == "__main__":
    main()
