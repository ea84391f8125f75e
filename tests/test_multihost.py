"""Per-host data sharding + global batch assembly (single-process emulation).

The HostLoader process-sharding contract: all hosts derive the SAME global
permutation from (seed, epoch), take disjoint strides of it, run the same
number of steps, and mark padding with label -1 — exactly once per real
sample per epoch across the fleet.
"""
import numpy as np
import pytest
from PIL import Image

from heuristique_style_transfer_code_tpu.data.loader import HostLoader


@pytest.fixture(scope="module")
def samples(tmp_path_factory):
    root = tmp_path_factory.mktemp("mhdata")
    rng = np.random.RandomState(0)
    out = []
    for i in range(11):  # deliberately awkward count
        p = str(root / f"s{i}.png")
        Image.fromarray(rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)).save(p)
        out.append((p, i % 4))
    return out


def _collect(loader):
    batches = list(loader)
    idxs, labels = [], []
    for b in batches:
        idxs.extend(b["indices"].tolist())
        labels.extend(b["label"].tolist())
    return batches, np.asarray(idxs), np.asarray(labels)


class TestProcessSharding:
    @pytest.mark.parametrize("pc", [2, 3])
    def test_disjoint_exact_cover(self, samples, pc):
        per_host = []
        for pi in range(pc):
            loader = HostLoader(
                samples, batch_size=2, shuffle=True, seed=5,
                process_index=pi, process_count=pc, num_workers=2,
            )
            per_host.append(_collect(loader))
        # same number of steps on every host (pjit requirement)
        steps = {len(b) for b, _, _ in per_host}
        assert len(steps) == 1
        # valid (label != -1) entries cover each sample exactly once
        seen = []
        for _, idxs, labels in per_host:
            seen.extend(idxs[labels >= 0].tolist())
        assert sorted(seen) == list(range(len(samples)))

    def test_same_global_permutation_across_hosts(self, samples):
        # hosts must agree on the epoch order without communicating:
        # host strides interleave back into one permutation of the samples
        pc = 2
        strides = []
        for pi in range(pc):
            loader = HostLoader(
                samples, batch_size=2, shuffle=True, seed=9,
                process_index=pi, process_count=pc, num_workers=2,
            )
            order, valid = loader._order()
            strides.append((order, valid))
        total = sum(len(o) for o, _ in strides)
        merged = np.empty(total, dtype=int)
        merged_valid = np.empty(total, dtype=bool)
        for pi, (o, v) in enumerate(strides):
            merged[pi::pc] = o
            merged_valid[pi::pc] = v
        real = merged[merged_valid]
        assert sorted(real.tolist()) == list(range(len(samples)))
        # and it equals the single-host permutation for the same seed/epoch
        solo = HostLoader(samples, batch_size=2, shuffle=True, seed=9)
        np.testing.assert_array_equal(solo._order()[0], real)

    def test_padding_marked_invalid(self, samples):
        loader = HostLoader(
            samples, batch_size=4, process_index=0, process_count=2,
            num_workers=2,
        )
        batches, idxs, labels = _collect(loader)
        n_valid = sum(b["n_valid"] for b in batches)
        assert n_valid == int((labels >= 0).sum())
        assert (labels >= 0).sum() <= len(samples)

    def test_single_host_unchanged(self, samples):
        a = _collect(HostLoader(samples, batch_size=4, shuffle=True, seed=3))
        b = _collect(
            HostLoader(
                samples, batch_size=4, shuffle=True, seed=3,
                process_index=0, process_count=1,
            )
        )
        np.testing.assert_array_equal(a[1], b[1])
        np.testing.assert_array_equal(a[2], b[2])


class TestGlobalBatchAssembly:
    def test_make_global_batch_on_mesh(self, samples):
        import jax

        from heuristique_style_transfer_code_tpu.parallel.multihost import (
            global_batch_dict,
            initialize_distributed,
        )
        from heuristique_style_transfer_code_tpu.parallel.sharding import (
            batch_sharding,
            image_sharding,
            make_mesh_2d,
        )

        assert initialize_distributed() == 0  # single-process no-op
        mesh = make_mesh_2d(8, model_parallel=2)
        loader = HostLoader(samples, batch_size=8, num_workers=2)
        batch = next(iter(loader))
        g = global_batch_dict(batch, image_sharding(mesh), batch_sharding(mesh))
        assert g["image"].shape == batch["image"].shape  # pc=1: global==local
        assert g["label"].sharding.is_equivalent_to(batch_sharding(mesh), 1)
        np.testing.assert_array_equal(np.asarray(g["image"]), batch["image"])
        # sharded arrays feed a jitted reduction without host round-trips
        total = jax.jit(lambda x: x.astype(jax.numpy.int32).sum())(g["image"])
        assert int(total) == int(batch["image"].astype(np.int64).sum())
