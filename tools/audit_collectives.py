"""Audit SCALING.md's collective arithmetic against the compiled programs
(VERDICT r4 #6): compile the dp / ZeRO-1 / FSDP flagship train steps and the
GPipe pipeline step on the 8-virtual-device CPU mesh, extract every
collective op (all-reduce / all-gather / reduce-scatter / collective-permute)
with its payload bytes from the OPTIMIZED HLO, and cross-check the
hand-derived byte counts in SCALING.md.

Collective payloads depend only on parameter/boundary shapes — not on the
backend — so the virtual CPU mesh compiles the same GSPMD communication
structure a real slice would (the byte table transfers; only the time
predictions need hardware constants).

Notes on accounting: the HLO op's LOGICAL payload is reported (output bytes
for gather/permute, input bytes for reduce-scatter, tensor bytes for
all-reduce). Wire bytes per device follow the standard ring identities
(all-reduce 2.B.(D-1)/D, all-gather/reduce-scatter B.(D-1)/D, permute B).
Ops inside a scan/while body appear once in the HLO — the pipeline section
multiplies by the tick trip count explicitly.
"""
import os
import re
import sys

sys.path.insert(0, "/root/repo")

from __graft_entry__ import virtual_cpu_xla_flags  # noqa: E402

N_DEV = 8
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = virtual_cpu_xla_flags(
    os.environ.get("XLA_FLAGS", ""), N_DEV
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", N_DEV)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from heuristique_style_transfer_code_tpu.core.cache import (  # noqa: E402
    enable_compile_cache,
)

enable_compile_cache(cpu_executables=True)

from __graft_entry__ import _flagship  # noqa: E402

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}
_SHAPE_TOK = re.compile(r"([a-z0-9]+)\[([\d,]*)\]")
_COLLECTIVE = re.compile(
    r"=\s+(\([^)]*\)|[a-z0-9]+\[[\d,]*\](?:\{[^}]*\})?)\s+"
    r"(all-reduce-start|all-reduce|all-gather-start|all-gather|"
    r"reduce-scatter|collective-permute-start|collective-permute|"
    r"all-to-all)\("
)


def _shape_bytes(tok: str) -> int:
    m = _SHAPE_TOK.match(tok)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def collective_summary(hlo_text: str) -> dict:
    """{op: [count, payload_bytes]} over the whole optimized module."""
    out: dict = {}
    for m in _COLLECTIVE.finditer(hlo_text):
        shapes, op = m.group(1), m.group(2).replace("-start", "")
        toks = _SHAPE_TOK.findall(shapes)
        nbytes = sum(
            _shape_bytes(f"{dt}[{dims}]") for dt, dims in toks
        )
        d = out.setdefault(op, [0, 0])
        d[0] += 1
        d[1] += nbytes
    return out


def fmt(summary: dict) -> str:
    rows = []
    for op in sorted(summary):
        c, b = summary[op]
        rows.append(f"    {op:<20} n={c:<4} payload={b/1e6:10.3f} MB")
    return "\n".join(rows) if rows else "    (none)"


def main():
    from heuristique_style_transfer_code_tpu.data.augment import make_augment_fn
    from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
        combined_apply,
    )
    from heuristique_style_transfer_code_tpu.parallel.sharding import (
        batch_sharding,
        image_sharding,
        make_fsdp_train_step,
        make_mesh_2d,
        zero1_state_shardings,
    )
    from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
    from heuristique_style_transfer_code_tpu.train.train_loop import (
        make_train_step,
    )

    truncate = 8
    mesh = make_mesh_2d(N_DEV, model_parallel=1)  # pure-DP (data=8) mesh
    D = mesh.shape["data"]
    host_vars = jax.tree_util.tree_map(
        np.asarray, _flagship(jax.random.PRNGKey(0), truncate=truncate)
    )
    leaves = jax.tree_util.tree_leaves(host_vars)
    tree_bytes = sum(x.size * 4 for x in leaves)
    print(f"mesh {dict(mesh.shape)}; flagship tree "
          f"{sum(x.size for x in leaves)/1e6:.2f} M leaves = "
          f"{tree_bytes/1e6:.1f} MB f32")

    def forward_train(v, images):
        logits, new_v = combined_apply(
            v["moco"], v["classifier"], images, truncate, train=True
        )
        return logits, {"moco": new_v, "classifier": v["classifier"]}

    optimizer = sgd_momentum(0.01, host_vars)
    augment = make_augment_fn(
        [(None, None), ("horizontal_flip", "brightness")], crop=64
    )

    batch = 2 * D
    variables = jax.tree_util.tree_map(jnp.asarray, host_vars)
    opt_state = optimizer.init(variables)
    images = jax.device_put(
        jnp.zeros((batch, 96, 96, 3), dtype=jnp.uint8), image_sharding(mesh)
    )
    labels = jax.device_put(
        jnp.asarray(np.arange(batch) % 4, dtype=jnp.int32),
        batch_sharding(mesh),
    )
    combos = jax.device_put(
        jnp.asarray(np.arange(batch) % 2, dtype=jnp.int32),
        batch_sharding(mesh),
    )
    key = jax.random.PRNGKey(1)
    results = {}

    def audit(name, step, *args):
        print(f"\n[{name}] lowering + compiling...")
        compiled = step.lower(*args).compile()
        summary = collective_summary(compiled.as_text())
        results[name] = summary
        print(fmt(summary))
        return summary

    # --- plain DP ------------------------------------------------------
    dp_step = make_train_step(forward_train, optimizer, augment, mesh=mesh)
    s = audit("dp", dp_step, variables, opt_state, images, labels, combos, key)
    ar = s.get("all-reduce", [0, 0])[1]
    print(f"  SCALING.md prediction: one grad all-reduce of the full tree "
          f"= {tree_bytes/1e6:.1f} MB (+ BN-stat/loss reductions)")
    print(f"  measured all-reduce payload {ar/1e6:.1f} MB -> "
          f"delta {(ar-tree_bytes)/1e6:+.2f} MB")
    print(f"  ring wire bytes/device = 2*B*(D-1)/D = "
          f"{2*ar*(D-1)/D/1e6:.1f} MB")

    # --- ZeRO-1 --------------------------------------------------------
    osh = zero1_state_shardings(
        jax.eval_shape(optimizer.init, variables), mesh
    )
    z_step = make_train_step(
        forward_train, optimizer, augment, mesh=mesh, opt_sharding=osh
    )
    z_state = jax.device_put(optimizer.init(variables), osh)
    s = audit("zero1", z_step, variables, z_state, images, labels, combos, key)
    print(f"  SCALING.md prediction: reduce-scatter(grads)+all-gather"
          f"(params) == all-reduce traffic; shards {tree_bytes/D/1e6:.1f} "
          f"MB, gathered {tree_bytes/1e6:.1f} MB")

    # --- FSDP ----------------------------------------------------------
    state_host = optimizer.init(host_vars)
    f_step, fv_shard, fo_shard = make_fsdp_train_step(
        forward_train, optimizer, augment, mesh, host_vars, state_host
    )
    fvars = jax.device_put(
        jax.tree_util.tree_map(jnp.asarray, host_vars), fv_shard
    )
    fstate = jax.device_put(state_host, fo_shard)
    s = audit("fsdp", f_step, fvars, fstate, images, labels, combos, key)
    ag = s.get("all-gather", [0, 0])[1]
    print(f"  SCALING.md prediction: ~2 param all-gathers (fwd + bwd "
          f"re-gather) = {2*tree_bytes/1e6:.1f} MB + grad reduce-scatter")
    print(f"  measured all-gather payload {ag/1e6:.1f} MB -> "
          f"ratio vs 2P = {ag/(2*tree_bytes):.2f}")

    # --- pipeline (GPipe) ----------------------------------------------
    from heuristique_style_transfer_code_tpu.parallel import pipeline as pp

    pipe, MB, M, IMG = 4, 1, 2, 32
    mesh_pp = pp.make_mesh_pipeline(N_DEV, pipe=pipe)
    dsize = mesh_pp.shape["data"]
    spec = pp.make_pipeline_spec(host_vars, pipe, MB, IMG)
    psh = pp.pipeline_param_sharding(mesh_pp)
    stacked = jax.device_put(pp.pack_pipeline_params(spec, host_vars), psh)
    tmask, smask = pp.pack_pipeline_masks(spec, host_vars)
    tmask, smask = jax.device_put(tmask, psh), jax.device_put(smask, psh)
    rng_pp = np.random.RandomState(5)
    pimages = jnp.asarray(
        rng_pp.rand(M, MB * dsize, IMG, IMG, 3).astype(np.float32)
    )
    plabels = jnp.asarray(
        rng_pp.randint(0, 4, size=(M, MB * dsize)).astype(np.int32)
    )
    bsh = pp.pipeline_batch_sharding(mesh_pp)
    pstep = pp.make_pipeline_train_step(spec, mesh_pp, lr=0.01)
    s = audit(
        "pipeline", pstep, stacked,
        jax.device_put(jnp.zeros_like(stacked), psh), tmask, smask,
        jax.device_put(pimages, bsh), jax.device_put(plabels, bsh),
    )
    per_tick = MB * dsize // dsize * spec.act_flat * 4  # mb x padded boundary
    ticks = M + pipe - 1
    cp = s.get("collective-permute", [0, 0])
    print(f"  per-tick boundary prediction: mb x act_flat x 4 = "
          f"{MB} x {spec.act_flat} x 4 = {per_tick/1e6:.3f} MB "
          f"(x {ticks} fwd ticks + backward transpose ring; scan bodies "
          f"appear once in HLO)")
    print(f"  measured collective-permute: n={cp[0]} payload/appearance "
          f"total {cp[1]/1e6:.3f} MB")

    print("\n=== summary (paste into SCALING.md audit table) ===")
    for name, summary in results.items():
        parts = ", ".join(
            f"{op} n={c} {b/1e6:.1f}MB" for op, (c, b) in sorted(summary.items())
        )
        print(f"{name}: {parts}")


if __name__ == "__main__":
    main()
