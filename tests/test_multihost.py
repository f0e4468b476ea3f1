"""Multi-host smoke test: 2 CPU processes join via jax.distributed, build
the DCN-aware hybrid mesh, feed per-host batch shards through
``multihost_batch`` and run one REAL sharded train step — the exact wiring
scripts/launch_pod.py uses on a pod slice (cross-host collectives ride Gloo
here, DCN there)."""
import os
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, port = int(sys.argv[1]), sys.argv[2]

from mdcnet_tpu.core import distributed as dist
dist.initialize(coordinator_address=f"localhost:{port}",
                num_processes=2, process_id=pid)
assert jax.process_count() == 2

import jax.numpy as jnp
import numpy as np
from mdcnet_tpu.config import PAD_ID, test_preset
from mdcnet_tpu.models import build_model
from mdcnet_tpu.parallel import sharding as sh
from mdcnet_tpu.train.state import create_train_state, make_optimizer
from mdcnet_tpu.train.step import make_train_step

mesh = dist.hybrid_mesh()
assert dict(mesh.shape) == {"data": 2, "model": 1, "context": 1}, mesh.shape

cfg = test_preset()
model = build_model(cfg.model)
rng = jax.random.PRNGKey(0)  # same seed everywhere -> identical init
local_b = 2
images_l = np.random.default_rng(42 + pid).random(
    (local_b, cfg.data.img_size, cfg.data.img_size, 3), np.float32)
y_l = np.full((local_b, cfg.data.max_len), PAD_ID, np.int32)
y_l[:, :11] = [300, 303, 270, 271, 304, 263, 10, 20, 110, 120, 301]

state = create_train_state(
    model, cfg, rng,
    jnp.zeros((2 * local_b, cfg.data.img_size, cfg.data.img_size, 3)),
    jnp.zeros((2 * local_b, cfg.data.max_len - 1), jnp.int32))
state = sh.shard_state(state, mesh, make_optimizer(cfg.train))
images, y = dist.multihost_batch(mesh, images_l, y_l)
assert images.shape[0] == 2 * local_b  # global batch

train_step, _ = make_train_step(model, cfg)
with mesh:
    state, metrics = train_step(state, images, y)
    jax.block_until_ready(metrics)
loss = float(metrics["total_loss"])
assert np.isfinite(loss)
print(f"MHOK {pid} {loss:.6f}", flush=True)
"""


EPOCH_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, port = int(sys.argv[1]), sys.argv[2]

from mdcnet_tpu.core import distributed as dist
dist.initialize(coordinator_address=f"localhost:{port}",
                num_processes=2, process_id=pid)

import jax.numpy as jnp
import numpy as np
from mdcnet_tpu.config import PAD_ID, test_preset
from mdcnet_tpu.data.pipeline import Batch
from mdcnet_tpu.models import build_model
from mdcnet_tpu.train.loop import Trainer
from mdcnet_tpu.train.state import create_train_state
from tests.test_text import make_tokenizer

mesh = dist.hybrid_mesh()
cfg = test_preset()
tok = make_tokenizer(max_len=cfg.data.max_len)
model = build_model(cfg.model)
rng = jax.random.PRNGKey(0)
local_b = 2

tokens_l = np.full((local_b, cfg.data.max_len), PAD_ID, np.int32)
tokens_l[:, :11] = [300, 303, 270, 271, 304, 263, 10, 20, 110, 120, 301]
images_l = (np.random.default_rng(7 + pid).random(
    (local_b, cfg.data.img_size, cfg.data.img_size, 3)) * 255
    ).astype(np.uint8)
loader = [Batch(images=images_l, tokens=tokens_l,
                boxes=np.zeros((local_b, 1, 4), np.float32),
                labels=np.zeros((local_b, 1), np.int64))]

state = create_train_state(
    model, cfg, rng,
    jnp.zeros((2 * local_b, cfg.data.img_size, cfg.data.img_size, 3)),
    jnp.zeros((2 * local_b, cfg.data.max_len - 1), jnp.int32))
trainer = Trainer(model, cfg, mesh=mesh)
state = trainer.shard_state(state)
with mesh:
    # the full metric battery: eval decode + process_allgather of the
    # sharded aux arrays + global-batch row iteration (the round-2 crash)
    out = trainer.valid_epoch(state, loader, tokenizer=tok)
assert "map@0.3" in out and "bleu" in out, sorted(out)
assert np.isfinite(out["ce_loss"])
print(f"MHEPOCH {pid} {out['ce_loss']:.6f} {out['bleu']:.6f} "
      f"{out['map@0.3']:.6f}", flush=True)
"""


def _run_two_process(worker_src, marker):
    port = str(15000 + os.getpid() % 10000)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="", XLA_FLAGS="")
    procs = [subprocess.Popen([sys.executable, "-c", worker_src, str(pid),
                               port],
                              cwd=repo, env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for pid in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    rows = []
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, out[-3000:]
        line = [l for l in out.splitlines() if l.startswith(marker)][0]
        rows.append([float(v) for v in line.split()[2:]])
    return rows


@pytest.mark.skipif(sys.platform != "linux", reason="gloo smoke on linux")
def test_two_process_train_step():
    rows = _run_two_process(WORKER, "MHOK")
    # both hosts computed the same (replicated) global loss
    np.testing.assert_allclose(rows[0][0], rows[1][0], rtol=1e-6)


@pytest.mark.skipif(sys.platform != "linux", reason="gloo smoke on linux")
def test_two_process_valid_epoch_battery():
    """Epoch-level multi-host run: valid_epoch's metric battery must gather
    the data-sharded eval aux with process_allgather and iterate the GLOBAL
    batch (it crashed on non-addressable arrays before round 3)."""
    rows = _run_two_process(EPOCH_WORKER, "MHEPOCH")
    # loss/bleu/mAP identical on both hosts (computed from the same
    # gathered global arrays)
    np.testing.assert_allclose(rows[0], rows[1], rtol=1e-6)
