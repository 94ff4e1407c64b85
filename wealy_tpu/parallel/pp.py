"""Pipeline parallelism for the Whisper encoder (GPipe schedule over ICI).

The reference has no parallelism of any kind (SURVEY.md §2.8); this module —
like tp.py — is one of the TPU-native first-class components the build
introduces. TP (tp.py) splits the WIDTH of every layer across chips;
pipeline parallelism splits the DEPTH: each chip holds a contiguous slice of
the transformer stack's layers, microbatches flow stage-to-stage over ICI
via ``lax.ppermute``, and at steady state every stage computes a different
microbatch concurrently (the classic GPipe schedule: ``M + S - 1`` steps for
``M`` microbatches over ``S`` stages, bubble fraction ``(S-1)/(M+S-1)``).

Where TP pays one collective per Megatron block pair, PP's only cross-chip
traffic is ONE (mb, T, D) activation ppermute per stage per step — the right
trade when ICI hop latency (not bandwidth) dominates, when layers are narrow
(tiny/base: TP under-fills the MXU per chip), or when the param+activation
footprint of a single chip is the binding constraint (PP divides resident
layer params by S with zero layout change to the per-layer compute).

The implementation leans on the encoder's ``scan_layers`` parameter layout
(models/whisper/model.py: "blocks"/"block"/... leaves with a leading layer
axis): stage s's parameter shard is literally rows ``[s*L/S, (s+1)*L/S)`` of
every stacked leaf, so ``shard_map`` with ``P("stage")`` on that axis IS the
stage assignment — no per-stage parameter surgery. The conv stem + position
table and the final LayerNorm are replicated (their cost is ~one layer).

Composes with data parallelism: pass a ("data", "stage") mesh and the mel
batch is row-sharded over ``data`` while each data-slice pipelines over
``stage`` (the dryrun exercises exactly this composition).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from wealy_tpu.models.whisper.model import _ScanBlockBody, sinusoids


class _Stem(nn.Module):
    """Conv stem + position add, parameter-tree-identical to WhisperEncoder's
    prefix (``conv1``/``conv2``/``positions``) so the full encoder's params
    apply unchanged."""

    config: Any
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, mel):
        cfg = self.config
        x = jnp.swapaxes(mel, 1, 2).astype(self.dtype)
        x = nn.Conv(cfg.n_audio_state, (3,), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(cfg.n_audio_state, (3,), strides=(2,), padding=1,
                    dtype=self.dtype, name="conv2")(x)
        x = nn.gelu(x, approximate=False)
        pos = self.param(
            "positions",
            lambda _key, shape: sinusoids(shape[0], shape[1]),
            (cfg.n_audio_ctx, cfg.n_audio_state),
        )
        return x + pos[None, : x.shape[1]].astype(self.dtype)


class _BlockStack(nn.Module):
    """``n_layers`` encoder blocks as one nn.scan — the per-stage slice of
    the full encoder's "blocks" tree applies directly (same names, leading
    layer axis of length L/S instead of L)."""

    n_state: int
    n_head: int
    n_layers: int
    dtype: Any = jnp.bfloat16
    use_flash: bool = True

    @nn.compact
    def __call__(self, x):
        Scan = nn.scan(
            _ScanBlockBody,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.n_layers,
        )
        y, _ = Scan(
            self.n_state, self.n_head, dtype=self.dtype,
            use_flash=self.use_flash, name="blocks",
        )(x, None)
        return y


class _LnPost(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(x)
        return x.astype(self.dtype)


def make_pp_mesh(n_stage: int, n_data: int = 1, devices=None) -> Mesh:
    """(data, stage) mesh; stage axis innermost so the per-step activation
    ppermute rides nearest-neighbor ICI links."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert n_data * n_stage == devices.size, (n_data, n_stage, devices.size)
    return Mesh(devices.reshape(n_data, n_stage), axis_names=("data", "stage"))


def pp_encode_fn(encoder, mesh: Mesh, n_micro: int = 4):
    """Jitted pipeline-parallel encoder over the mesh's ``stage`` axis.

    ``encoder`` must be a scan-layers WhisperEncoder (or the encoder half of
    a Whisper built with ``scan_layers=True``; convert unrolled checkpoints
    with models/whisper/convert.py::stack_block_params). Its layer count
    must divide evenly by the stage count, and the (per-data-shard) batch by
    ``n_micro``.

    Returns ``fn(params, mel) -> (B, T, D) states`` — params are the plain
    (replicated-layout) encoder tree; shard_map's ``P("stage")`` in_spec on
    the stacked block leaves performs the stage assignment. Output matches
    the single-device encoder exactly (same ops, same order — asserted in
    tests and the driver dryrun).

    Differentiable: the schedule is a ``lax.scan``, so ``jax.grad`` through
    the returned fn trains the pipelined encoder (GPipe semantics — the
    scan stashes per-step residuals for the backward pass; per-stage
    activation memory is O((M+S-1) * mb * T * D), traded back to FLOPs with
    ``jax.checkpoint`` around the block stack if needed). Gradients match
    the single-device encoder's exactly (tests/test_pp.py).
    """
    cfg = encoder.config
    S = mesh.shape["stage"]
    L = cfg.n_audio_layer
    if L % S != 0:
        raise ValueError(f"n_audio_layer={L} not divisible by {S} stages")
    dp = "data" in mesh.axis_names and mesh.shape["data"] > 1
    M = n_micro
    stem = _Stem(cfg, dtype=encoder.dtype)
    blocks = _BlockStack(
        cfg.n_audio_state, cfg.n_audio_head, n_layers=L // S,
        dtype=encoder.dtype, use_flash=encoder.use_flash,
    )
    ln = _LnPost(dtype=encoder.dtype)

    def pipe(stem_p, block_p, ln_p, mel):
        # local view: mel is this data-shard's rows, block_p this stage's
        # L/S stacked layers; the stem is computed redundantly per stage
        # (cheaper than broadcasting its output from stage 0)
        sidx = jax.lax.axis_index("stage")
        x0 = stem.apply({"params": stem_p}, mel)  # (B, T, D)
        # the stem output is replication-INVARIANT along stage (same params,
        # same mel everywhere) but the pipeline state becomes stage-VARYING
        # the moment stage-sharded block params touch it; mark it varying up
        # front so the fori_loop carry types are uniform
        x0 = jax.lax.pcast(x0, ("stage",), to="varying")
        B = x0.shape[0]
        if B % M != 0:
            raise ValueError(f"batch {B} not divisible by n_micro={M}")
        micro = x0.reshape(M, B // M, *x0.shape[1:])
        out = jnp.zeros_like(micro)
        fwd = [(i, (i + 1) % S) for i in range(S)]

        def body(carry, t):
            x, out = carry
            y = blocks.apply({"params": block_p}, x)
            # the last stage finished microbatch t-(S-1) this step
            mb_i = t - (S - 1)
            valid = (mb_i >= 0) & (mb_i < M) & (sidx == S - 1)
            idx = jnp.clip(mb_i, 0, M - 1)
            prev = jax.lax.dynamic_index_in_dim(out, idx, 0, keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(valid, y, prev), idx, 0
            )
            # hand the activation to the next stage; stage 0 instead picks
            # up the next microbatch from the stem output
            y_next = jax.lax.ppermute(y, "stage", fwd)
            nxt = jnp.clip(t + 1, 0, M - 1)
            feed = jax.lax.dynamic_index_in_dim(micro, nxt, 0, keepdims=False)
            x = jnp.where(sidx == 0, feed, y_next)
            return (x, out), None

        # lax.scan (not fori_loop) so the schedule is reverse-differentiable:
        # grads ride the ppermute/psum transposes back through the pipeline,
        # making pp a TRAINING transform too (GPipe semantics — scan stashes
        # each step's residuals for the backward pass; wrap `blocks.apply`
        # in jax.checkpoint upstream to trade FLOPs for that memory)
        (_, out), _ = jax.lax.scan(
            body, (micro[0], out), jnp.arange(M + S - 1)
        )
        # only the last stage wrote non-zeros; one psum replicates the
        # finished activations across the stage axis for the final LN
        out = jax.lax.psum(out, "stage")
        return ln.apply({"params": ln_p}, out.reshape(B, *out.shape[2:]))

    mel_spec = P("data", None, None) if dp else P()
    out_spec = P("data", None, None) if dp else P()

    pipe_sharded = shard_map(
        pipe, mesh=mesh,
        in_specs=(P(), P("stage"), P(), mel_spec),
        out_specs=out_spec,
    )

    @jax.jit
    def encode(params, mel):
        p = params["encoder"] if "encoder" in params else params
        if "blocks" not in p:
            raise ValueError(
                "pipeline parallelism needs the scan-layers param layout "
                "('blocks' with a leading layer axis); convert with "
                "stack_block_params"
            )
        stem_p = {k: p[k] for k in ("conv1", "conv2", "positions")}
        return pipe_sharded(
            stem_p, {"blocks": p["blocks"]}, {"ln_post": p["ln_post"]}, mel
        )

    return encode
