"""Honest packed-kernel microbench: device time from the profiler, CSE
defeated via distinct per-layer inputs.

Wall-clock over the axon tunnel is polluted by host contention; this harness
traces each config with jax.profiler and reports the summed device time of
the pallas custom-calls. Sweeps (block_q, block_k) x window x h_block x mask.
"""

from __future__ import annotations

import collections
import glob
import json
import os
import re
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LAYERS = 8


def device_ms_per_layer(stack_fn, args, tag):
    import jax

    out_dir = f"/tmp/kernel_tune/{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)
    out = stack_fn(*args)
    jax.device_get(out)
    iters = 4
    with jax.profiler.trace(out_dir):
        outs = [stack_fn(*args) for _ in range(iters)]
        jax.device_get(outs)

    sys.path.insert(0, "/opt/venv/lib/python3.12/site-packages/tensorflow")
    from tsl.profiler.protobuf import xplane_pb2

    kernel_ps = 0
    other_ps = 0
    for path in glob.glob(out_dir + "/**/*.xplane.pb", recursive=True):
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if plane.name != "/device:TPU:0":
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = plane.event_metadata[ev.metadata_id].name
                    if re.match(r"%(stack|attn|fusion\.?\d*\b.*custom)", name) or "custom-call" in name or name.startswith("%stack"):
                        kernel_ps += ev.duration_ps
                    else:
                        other_ps += ev.duration_ps
    shutil.rmtree(out_dir, ignore_errors=True)
    return kernel_ps / 1e9 / iters / LAYERS, other_ps / 1e9 / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    import open_provence_tpu.ops.flash_attention as fa
    from open_provence_tpu.ops.rotary import rope_tables

    B, S, H, NH, HD = 32, 512, 768, 12, 64
    qkvs = [
        jax.random.normal(jax.random.PRNGKey(i), (B, S, 3 * H), dtype=jnp.bfloat16)
        for i in range(LAYERS)
    ]
    cos, sin = rope_tables(S, HD, 10000.0, dtype=jnp.float32)
    rope = jnp.stack([cos, sin])
    mask = jnp.ones((B, S), dtype=jnp.int32)

    def make_stack(window, bq, bk, use_mask=True, use_rope=True):
        @jax.jit
        def stack(qkvs, mask):
            outs = []
            for lid in range(LAYERS):
                o = fa._flash_forward_packed(
                    qkvs[lid],
                    NH,
                    mask if use_mask else None,
                    rope if use_rope else None,
                    window,
                    bq,
                    bk,
                )
                outs.append(o[:1, :1, :1])
            return jnp.concatenate(outs)

        return stack

    orig_choose = fa._choose_h_block
    configs = []
    for window in (None, 128):
        for bq, bk in ((512, 512), (256, 512), (256, 256), (128, 512)):
            for h in (2, 4, 6):
                configs.append((window, bq, bk, h, True, True))
    # ablations at the default config
    configs += [
        (None, 512, 512, 6, False, True),   # no padding mask
        (None, 512, 512, 6, True, False),   # no fused rope
        (128, 512, 512, 6, False, True),
        (128, 512, 512, 6, True, False),
    ]

    results = {}
    for i, (window, bq, bk, h, use_mask, use_rope) in enumerate(configs):
        fa._choose_h_block = lambda *a, _h=h, **k: _h
        name = f"w={window} bq={bq} bk={bk} h={h} mask={use_mask} rope={use_rope}"
        try:
            fn = make_stack(window, bq, bk, use_mask, use_rope)
            ms, other = device_ms_per_layer(fn, (qkvs, mask), f"c{i}")
        except Exception as e:
            print(json.dumps({"cfg": name, "error": str(e)[:150]}), flush=True)
            continue
        results[name] = ms
        print(json.dumps({"cfg": name, "dev_ms_per_layer": round(ms, 4), "other_ms": round(other, 3)}), flush=True)
    fa._choose_h_block = orig_choose
    print("--- best ---")
    for name, v in sorted(results.items(), key=lambda kv: kv[1])[:12]:
        print(json.dumps({"cfg": name, "dev_ms_per_layer": round(v, 4)}), flush=True)


if __name__ == "__main__":
    main()
