"""Measure eval --steps_per_dispatch on the real TPU.

Times run_classification_test end-to-end (dispatch + fetch + host
bookkeeping) over a synthetic ImageFolder test split at K = 1 vs K, same
weights, same loader contents. Each configuration runs twice in-process;
the second (warm — both programs compiled) is the reported number. Through
the axon relay each per-batch dispatch+fetch costs a ~30 ms RTT, so the
expected ceiling is ~K× on relay-bound workloads; on directly-attached
TPUs the per-dispatch saving is ~100 µs/batch.

Usage: python tools/bench_eval_dispatch.py <imagefolder_root> [K] [batch]
"""
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/weather_evalperf"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import jax
    import tempfile

    from heuristique_style_transfer_code_tpu.config.schema import TruncatedResNetConfig
    from heuristique_style_transfer_code_tpu.data.imagefolder import ImageFolderIndex
    from heuristique_style_transfer_code_tpu.data.loader import HostLoader
    from heuristique_style_transfer_code_tpu.tasks.classification import (
        run_classification_test,
    )
    from heuristique_style_transfer_code_tpu.train.factories import (
        make_truncated_resnet50,
    )

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    cfg = TruncatedResNetConfig(batch_size=batch, lr=0.01, truncate_layer=5, dim=16)
    variables, _, _, _, forward_eval = make_truncated_resnet50(
        jax.random.PRNGKey(0), cfg, 4, [(None, None)]
    )
    idx = ImageFolderIndex(f"{root}/test")
    n_batches = (len(idx.samples) + batch - 1) // batch
    print(f"{len(idx.samples)} images, batch {batch} -> {n_batches} dispatches at K=1")

    results = {}
    for kk in (1, k):
        for attempt in ("cold", "warm"):
            loader = HostLoader(idx.samples, batch, shuffle=False)
            with tempfile.TemporaryDirectory() as td:
                t0 = time.perf_counter()
                res = run_classification_test(
                    forward_eval, variables, loader, idx.samples, idx.classes,
                    td, prob_threshold=0.0, steps_per_dispatch=kk,
                    log_fn=lambda *a, **kw: None,
                )
                dt = time.perf_counter() - t0
            print(f"K={kk} {attempt}: {dt:.3f}s  acc={res['accuracy']:.2f}")
            results[f"k{kk}_{attempt}_s"] = round(dt, 3)
            results[f"k{kk}_acc"] = res["accuracy"]
    results["speedup_warm"] = round(results["k1_warm_s"] / results[f"k{k}_warm_s"], 2)
    results["acc_match"] = results["k1_acc"] == results[f"k{k}_acc"]
    print(json.dumps(results))


if __name__ == "__main__":
    main()
