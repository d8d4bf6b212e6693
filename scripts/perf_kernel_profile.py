"""Profile an 8-layer distinct-input packed-kernel stack; dump per-op times."""

from __future__ import annotations

import collections
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    import open_provence_tpu.ops.flash_attention as fa
    from open_provence_tpu.ops.rotary import rope_tables

    B, S, H, NH, HD = 32, 512, 768, 12, 64
    LAYERS = 8
    key = jax.random.PRNGKey(0)
    qkvs = [
        jax.random.normal(jax.random.PRNGKey(i), (B, S, 3 * H), dtype=jnp.bfloat16)
        for i in range(LAYERS)
    ]
    cos, sin = rope_tables(S, HD, 10000.0, dtype=jnp.float32)
    rope = jnp.stack([cos, sin])
    mask = jnp.ones((B, S), dtype=jnp.int32)

    @jax.jit
    def stack(qkvs, mask):
        outs = []
        for lid in range(LAYERS):
            o = fa._flash_forward_packed(
                qkvs[lid], NH, mask, rope, None, 512, 512
            )
            outs.append(o[:1, :1, :1])
        return jnp.concatenate(outs)

    out = stack(qkvs, mask)
    jax.device_get(out)
    start = time.perf_counter()
    outs = [stack(qkvs, mask) for _ in range(8)]
    jax.device_get(outs)
    wall = (time.perf_counter() - start) / 8
    print(f"wall per call: {wall*1e3:.2f} ms ({wall*1e3/LAYERS:.3f} ms/layer)")

    out_dir = "/tmp/kernel_profile"
    with jax.profiler.trace(out_dir):
        outs = [stack(qkvs, mask) for _ in range(4)]
        jax.device_get(outs)

    import glob

    sys.path.insert(0, "/opt/venv/lib/python3.12/site-packages/tensorflow")
    from tsl.profiler.protobuf import xplane_pb2

    for path in glob.glob(out_dir + "/**/*.xplane.pb", recursive=True):
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(path, "rb").read())
        for plane in xs.planes:
            if plane.name != "/device:TPU:0":
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                agg = collections.Counter()
                cnt = collections.Counter()
                total = 0
                for ev in line.events:
                    name = ev.metadata_id and plane.event_metadata[ev.metadata_id].name
                    m = re.match(r"%([a-zA-Z0-9_.\-]+)", name or "")
                    opname = re.sub(r"\.\d+$", "", m.group(1)) if m else (name or "?")[:40]
                    agg[opname] += ev.duration_ps
                    cnt[opname] += 1
                    total += ev.duration_ps
                print(f"device total: {total/1e9/4:.2f} ms/call")
                for nm, ps in agg.most_common(15):
                    print(f"  {ps/1e9/4:8.3f} ms/call x{cnt[nm]//4:3d} {nm}")


if __name__ == "__main__":
    main()
