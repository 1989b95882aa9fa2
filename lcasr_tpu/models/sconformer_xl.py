"""SCConformerXL: self-conditioned CTC conformer for long-context ASR.

TPU-native re-design of the reference flagship model (reference
`lcasr/models/sconformer_xl.py:31-372`):

  subsampling (8x dw-striding conv) → n × ConformerLayer → linear CTC decoder
  with log-softmax, inter-layer self-conditioning (softmax of intermediate CTC
  posteriors projected back into the residual stream, reference `:241-243`),
  optional legacy double-norm before the output projection (`:246-247`).

Layer order (reference `:346-372`, all pre-norm residual):
  x += ½·FF1 ; x += MHSA ; x += Conv ; x += ½·FF2 ; x = norm_out(x)

TPU-first choices:
  * pure-functional flax module — params fp32, compute dtype configurable
    (bf16 for MXU throughput),
  * masking is driven statically: `length=None` selects the all-equal-length
    fast path at trace time (the reference's `length.max()==length.min()`
    runtime branch, `:204-205`, cannot exist under jit),
  * activation checkpointing via `nn.remat` on whole layers
    (replaces torch.utils.checkpoint + FusedMLP checkpoint_lvl),
  * attention runs the Pallas flash kernel on TPU and the exact jnp oracle
    elsewhere, both with identical window/length-mask semantics,
  * the deprecated cross-chunk KV-cache path (`:166-180`, marked "remove" in
    the reference) is intentionally not reproduced.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lcasr_tpu.models.decoder import ASRLinearSCDecoder
from lcasr_tpu.ops.attention import length_mask, reference_attention
from lcasr_tpu.ops.conv import ConformerConvolution, ConvSubsampling, StackingSubsampling
from lcasr_tpu.ops.mlp import ConformerFeedForward
from lcasr_tpu.ops.norms import get_norm
from lcasr_tpu.ops.rotary import RotaryEmbedding, apply_rotary


class Attention(nn.Module):
    """Fused-QKV multi-head attention with optional rotary + local window.

    Counterpart of reference `lcasr/components/attention.py:448-551`:
    one fused qkv projection, rotary on q/k, flash attention (here: Pallas on
    TPU, exact jnp elsewhere), output projection.  Padded positions are zeroed
    before the projection and on the output, as the reference does (`:511,547`).
    """

    n_feats: int
    head_dim: int
    n_heads: int
    window: Tuple[int, int] = (-1, -1)  # (left, right), -1 = unbounded
    causal: bool = False  # reference Attention 'causal' kwarg ≙ right window 0
    bias: bool = False
    qkv_bias: bool = False
    dropout: float = 0.0
    use_pallas: bool = True
    return_attention_weights: bool = False  # sow probs into 'intermediates'
    # sow post-rotary (q, k, v, lengths) into 'intermediates' WITHOUT leaving
    # the production Pallas path — the streaming prob capture
    # (ops/flash_attention.flash_attention_probs, analysis.attention_summary)
    # normalizes row-blocked scores by the kernel's own lse, so long-T
    # analysis never materializes (T, T).  Memory: 3·B·T·H·D per captured
    # layer — capture one layer per apply at hour-scale T.
    capture_qkv: bool = False
    # context parallel (inside shard_map, x time-sharded): local queries
    # attend to the seq-axis-gathered K/V with a global q_offset, so window
    # banding and length masks stay exact in global coordinates
    seq_axis_name: Optional[str] = None
    # 'gather' all-gathers K/V over the seq axis (exact, simple — KV memory
    # O(T) per device); 'ring' keeps K/V local and rotates blocks with
    # cross-step online-softmax merging (exact, KV memory O(T/n) per device —
    # the regime CP exists for, where full K/V exceeds per-shard HBM)
    attention_cp_impl: str = "gather"
    # int8 MXU projections (ops/qdense.py), split per site: the qkv GEMM's
    # int32 output cannot fuse into the Pallas flash kernel (extra HBM round
    # trip), so policy 'auto' leaves both off — see qdense.AUTO_SITES
    quant_qkv: bool = False
    quant_out: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        rotary: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        B, N, _ = x.shape
        H, D = self.n_heads, self.head_dim
        window = (self.window[0], 0) if self.causal else self.window

        cp = self.seq_axis_name
        q_off = jax.lax.axis_index(cp) * N if cp is not None else 0

        if lengths is not None:
            x = jnp.where(length_mask(lengths, N, offset=q_off)[..., None], x, 0.0)

        from lcasr_tpu.ops.qdense import quant_dot_general

        qkv = nn.Dense(3 * H * D, use_bias=self.qkv_bias, dtype=self.dtype,
                       dot_general=quant_dot_general(self.quant_qkv),
                       name="qkv_proj")(x)
        qkv = qkv.reshape(B, N, 3, H, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if rotary is not None:
            # under CP the tables are computed per shard at global positions,
            # so q and the (still-local) k share the same offset tables
            cos, sin = rotary
            q, k = apply_rotary(q, k, cos, sin)

        if self.capture_qkv:
            self.sow("intermediates", "attention_qkv", (q, k, v, lengths))

        if cp is not None and self.attention_cp_impl == "ring":
            if self.return_attention_weights:
                # the prob-capture path needs materialized scores; ring's
                # online-softmax merge never forms them — refuse rather than
                # silently sowing nothing
                raise NotImplementedError(
                    "return_attention_weights is unavailable under ring "
                    "context parallelism (use attention_cp_impl='gather')"
                )
            # ring attention: K/V stay LOCAL and rotate around the seq axis
            # with online-softmax merging (exact fwd + custom-VJP bwd,
            # parallel/ring_attention.py) — KV memory O(T/n) per device;
            # falls through to the shared mask/out_proj/dropout tail below
            from lcasr_tpu.parallel.ring_attention import make_ring_local

            ring_lengths = (
                lengths
                if lengths is not None
                else jnp.full((B,), N * jax.lax.axis_size(cp), jnp.int32)
            )
            out = make_ring_local(window, None, N, cp)(q, k, v, ring_lengths)
        else:
            if cp is not None:
                # gathered-KV context parallelism
                # (parallel/context_parallel.py inlined): exact,
                # differentiable
                k = jax.lax.all_gather(k, cp, axis=1, tiled=True)
                v = jax.lax.all_gather(v, cp, axis=1, tiled=True)

            use_pallas = (
                self.use_pallas
                and not self.return_attention_weights
                and jax.default_backend() == "tpu"
            )
            if use_pallas:
                from lcasr_tpu.ops.flash_attention import flash_attention

                out = flash_attention(
                    q, k, v, lengths=lengths, window=window, q_offset=q_off
                )
            elif self.return_attention_weights:
                # analysis path (reference CollectAttentionProbs,
                # attention.py:556-595): exact attention + prob capture
                out, probs = reference_attention(
                    q, k, v, q_lengths=lengths, kv_lengths=lengths,
                    window=window, return_weights=True, q_offset=q_off,
                )
                self.sow("intermediates", "attention_probs", probs)
            elif cp is not None and window[0] >= 0 and window[1] >= 0:
                # long banded sequences: O(chunk·band) score memory
                from lcasr_tpu.ops.attention import banded_attention_chunked

                out = banded_attention_chunked(
                    q, k, v, q_lengths=lengths, kv_lengths=lengths,
                    window=window, q_offset=q_off,
                )
            else:
                out = reference_attention(
                    q, k, v, q_lengths=lengths, kv_lengths=lengths,
                    window=window, q_offset=q_off,
                )

        out = out.reshape(B, N, H * D)
        if lengths is not None:
            out = jnp.where(length_mask(lengths, N, offset=q_off)[..., None], out, 0.0)
        out = nn.Dense(self.n_feats, use_bias=self.bias, dtype=self.dtype,
                       dot_general=quant_dot_general(self.quant_out),
                       name="out_proj")(out)
        if self.dropout > 0.0 and train:
            # APPROXIMATION vs the reference: dropout_attn is applied to the
            # projected attention OUTPUT here, not to the attention
            # probabilities (the Pallas kernel keeps probs unmaterialized).
            # Every paper config trains with dropout_attn 0.0, where the two
            # coincide exactly.
            out = nn.Dropout(self.dropout, deterministic=False)(out)
        return out


class ConformerLayer(nn.Module):
    """½FF1 → MHSA → Conv → ½FF2 → norm, all pre-norm residual
    (reference `sconformer_xl.py:255-372`)."""

    d_model: int
    n_heads: int
    head_dim: int
    conv_kernel_size: int = 9
    expansion_factor: int = 4
    conv_expansion_factor: float = 1.0
    conv_norm: str = "batch_renorm"
    conv_type: str = "standard"  # 'standard' | 'longconv' (arXiv:2302.06646)
    longconv_weight_init: str = "random"  # 'random' | 'double_exp'
    longconv_position_kernel: bool = True  # reference LongConv default
    longconv_ma_smoothing: bool = False
    longconv_ma_window_len: int = 7
    longconv_smooth_freq: bool = False
    default_norm: str = "layer_norm"
    sandwich_norm: bool = False
    bias_in_ff: bool = False
    transformer: bool = False  # disable convolutions / ff1
    window: Tuple[int, int] = (-1, -1)
    dropout_ff: float = 0.0
    dropout_conv: float = 0.0
    dropout_attn: float = 0.0
    use_pallas: bool = True
    return_attention_weights: bool = False
    capture_qkv: bool = False
    seq_axis_name: Optional[str] = None  # context parallel (inside shard_map)
    attention_cp_impl: str = "gather"  # 'gather' | 'ring' (see Attention)
    stat_axes: Tuple[str, ...] = ()  # mesh axes for batch-renorm statistics
    # W8A8 policy: False | True | 'auto' | site names (ops/qdense.py)
    quant_w8a8: Any = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        pad_mask: Optional[jnp.ndarray] = None,
        rotary: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        from lcasr_tpu.ops.qdense import quant_site

        qsite = lambda s: quant_site(self.quant_w8a8, s)  # noqa: E731
        Norm = get_norm(self.default_norm)
        if self.seq_axis_name is not None and self.conv_type == "longconv":
            raise NotImplementedError(
                "context parallel needs position-local convs (conv_type=standard)"
            )

        def dropped(h: jnp.ndarray, rate: float) -> jnp.ndarray:
            if rate > 0.0 and train:
                h = nn.Dropout(rate, deterministic=False)(h)
            return h

        if not self.transformer:
            h = Norm(self.d_model, name="ff1_norm")(x)
            # NOTE: FF hidden is ALWAYS 4×d_model — the reference's
            # expansion_factor never reaches the FF (it lands in unused
            # **kwargs, reference sconformer_xl.py:300-310); kept faithful
            # for checkpoint compatibility.
            h = ConformerFeedForward(
                self.d_model,
                hidden_dim=self.d_model * 4,
                bias1=self.bias_in_ff,
                bias2=self.bias_in_ff,
                quant_w8a8=qsite("ff"),
                dtype=self.dtype,
                name="ff1",
            )(h)
            if self.sandwich_norm:
                h = Norm(self.d_model, name="ff1_norm_out")(h)
            x = dropped(h, self.dropout_ff) * 0.5 + x

        h = Norm(self.d_model, name="attn_norm")(x)
        h = Attention(
            n_feats=self.d_model,
            head_dim=self.head_dim,
            n_heads=self.n_heads,
            window=self.window,
            dropout=self.dropout_attn,
            use_pallas=self.use_pallas,
            return_attention_weights=self.return_attention_weights,
            capture_qkv=self.capture_qkv,
            seq_axis_name=self.seq_axis_name,
            attention_cp_impl=self.attention_cp_impl,
            quant_qkv=qsite("qkv"),
            quant_out=qsite("attn_out"),
            dtype=self.dtype,
            name="attend",
        )(h, lengths=lengths, rotary=rotary, train=train)
        h = dropped(h, min(self.dropout_ff, 0.1))
        if self.sandwich_norm:
            h = Norm(self.d_model, name="attn_norm_out")(h)
        x = h + x

        if not self.transformer:
            h = Norm(self.d_model, name="conv_norm")(x)
            if self.conv_type == "longconv":
                from lcasr_tpu.ops.long_conv import ConformerLongConvolution

                h = ConformerLongConvolution(
                    d_model=self.d_model,
                    norm_type=self.conv_norm,
                    exp_factor=self.conv_expansion_factor,
                    weight_init=self.longconv_weight_init,
                    position_kernel=self.longconv_position_kernel,
                    use_ma_smoothing=self.longconv_ma_smoothing,
                    ma_window_len=self.longconv_ma_window_len,
                    smooth_freq=self.longconv_smooth_freq,
                    dtype=self.dtype,
                    name="conv",
                )(h, pad_mask=pad_mask, train=train)
            else:
                h = ConformerConvolution(
                    d_model=self.d_model,
                    kernel_size=self.conv_kernel_size,
                    norm_type=self.conv_norm,
                    exp_factor=self.conv_expansion_factor,
                    seq_axis_name=self.seq_axis_name,
                    stat_axes=self.stat_axes,
                    quant_w8a8=qsite("conv"),
                    dtype=self.dtype,
                    name="conv",
                )(h, pad_mask=pad_mask, train=train)
            x = dropped(h, self.dropout_conv) + x

        h = Norm(self.d_model, name="ff2_norm")(x)
        h = ConformerFeedForward(
            self.d_model,
            hidden_dim=self.d_model * 4,  # see ff1 note
            bias1=self.bias_in_ff,
            bias2=self.bias_in_ff,
            quant_w8a8=qsite("ff"),
            dtype=self.dtype,
            name="ff2",
        )(h)
        if self.sandwich_norm:
            h = Norm(self.d_model, name="ff2_norm_out")(h)
        x = dropped(h, self.dropout_ff) * 0.5 + x

        return Norm(self.d_model, name="norm_out")(x)


class SCConformerXL(nn.Module):
    """Flagship self-conditioned CTC conformer (reference `sconformer_xl.py:31`).

    Call: `model.apply(variables, audio, lengths, train=...)` with
    audio (B, feat_in, T) and optional lengths (B,).  Returns
    {'final_posteriors': (B, T', vocab+1) log-probs, 'length': (B,)}.
    """

    vocab_size: int = 128
    feat_in: int = 80
    subsampling: str = "dw_striding"
    subsampling_factor: int = 8
    subsampling_conv_channels: int = 256
    subsampling_act: str = "silu"
    subsampling_norm_out: bool = False
    n_layers: int = 6
    d_model: int = 768
    n_heads: int = 6
    head_dim: int = 128
    expansion_factor: int = 4
    dropout_ff: float = 0.0
    dropout_conv: float = 0.0
    dropout_attn: float = 0.0
    checkpoint_every_n_layers: int = 0
    # remat recompute policy for checkpointed layers:
    #   'nothing'  — save only layer boundaries; backward re-runs the whole
    #                layer (lowest memory, +1 forward of recompute FLOPs),
    #   'dots'     — jax.checkpoint_policies.dots_saveable: GEMM outputs are
    #                saved, only elementwise/norm chains recompute.  Costs
    #                ~2× the boundary activations in saved dot outputs but
    #                removes the recompute GEMMs — the backward becomes the
    #                same 2-GEMM-per-matmul schedule as no-remat training.
    # The reference's FusedMLP checkpoint_lvl 0/1/2 (fused_dense.py:209-498)
    # is this same trade expressed per-module; here it is a whole-model knob.
    remat_policy: str = "nothing"
    # rematerialize the conv-subsampling stage in the backward: its stage-1/2
    # activations dominate hour-scale memory (~0.6 GB/shard bf16 at 360k
    # frames / 8 shards — docs/MEMORY_BUDGET_1H.md) and are cheap to recompute
    remat_subsampling: bool = False
    conv_kernel_size: int = 9
    conv_expansion_factor: float = 1.0
    conv_norm: str = "batch_renorm"
    conv_type: str = "standard"
    longconv_weight_init: str = "random"
    longconv_position_kernel: bool = True
    longconv_ma_smoothing: bool = False
    longconv_ma_window_len: int = 7
    longconv_smooth_freq: bool = False
    decoder_norm: bool = False
    use_rotary: bool = False
    rotary_base_freq: float = 10000.0
    rotary_interpolation_factor: float = 1.0
    learned_rotary: bool = False
    fourier_pos_enc: bool = False
    self_conditioning: bool = True
    default_norm: str = "layer_norm"
    sandwich_norm: bool = False
    bias_in_ff: bool = False
    transformer: bool = False
    legasee_double_norm: bool = True
    attention_window_size: int = -1
    attention_window_size_left: Optional[int] = None
    attention_window_size_right: Optional[int] = None
    use_pallas: bool = True
    return_attention_weights: bool = False
    capture_qkv: bool = False
    # full-model context parallelism (SURVEY §2.9, a NEW capability vs the
    # reference): set when applying this module inside shard_map with the
    # audio time axis sharded over `seq_axis_name`.  Subsampling and the
    # conformer convs halo-exchange across shard boundaries, rotary/length
    # masks run in global coordinates, and attention gathers K/V over the
    # axis.  Use `parallel.cp_model.context_parallel_apply` as the entry.
    seq_axis_name: Optional[str] = None
    attention_cp_impl: str = "gather"  # 'gather' | 'ring' CP attention
    stat_axes: Tuple[str, ...] = ()  # mesh axes for batch-renorm statistics
    # W8A8 inference: projection/FF GEMMs run int8 on the MXU with dynamic
    # per-token activation scales (ops/qdense.py).  A POLICY, not a bool:
    # False | True (every site) | 'auto' (the sites measured to win on v5e —
    # FF + decoder; attention excluded because its int32 GEMM output can't
    # fuse into the Pallas flash kernel) | iterable of qdense.ALL_SITES
    # names.  Inference-only — rint's zero gradient silently kills backprop,
    # so train=True with any site enabled raises.  Param trees are
    # unchanged: any checkpoint serves quantized by constructing with
    # quant_w8a8='auto' (eval: `evaluate(..., quant_w8a8=True)` / CLI
    # `--w8a8[=policy]`).
    quant_w8a8: Any = False
    dtype: Any = jnp.float32

    @property
    def window(self) -> Tuple[int, int]:
        """Per-direction window override (reference `attention.py:321-328`)."""
        left = (
            self.attention_window_size_left
            if self.attention_window_size_left is not None
            else self.attention_window_size
        )
        right = (
            self.attention_window_size_right
            if self.attention_window_size_right is not None
            else self.attention_window_size
        )
        return (left, right)

    @nn.compact
    def __call__(
        self,
        audio_signal: jnp.ndarray,
        length: Optional[jnp.ndarray] = None,
        train: bool = False,
        return_logits: bool = False,
    ):
        from lcasr_tpu.ops.qdense import quant_site, resolve_quant_policy

        if resolve_quant_policy(self.quant_w8a8) and train:
            raise ValueError(
                "quant_w8a8 is inference-only (rint blocks gradients); "
                "build the training model without it"
            )
        x = jnp.swapaxes(audio_signal, 1, 2)  # (B, T, feat)
        x = x.astype(self.dtype)
        B = x.shape[0]

        have_lengths = length is not None
        if not have_lengths:
            t_global = x.shape[1] * (
                jax.lax.axis_size(self.seq_axis_name)
                if self.seq_axis_name is not None
                else 1
            )
            length = jnp.full((B,), t_global, dtype=jnp.int32)

        if self.subsampling == "stacking":
            if self.seq_axis_name is not None:
                # StackingSubsampling pads the LOCAL shard to a factor
                # multiple — zeros mid-global-sequence at shard boundaries
                raise NotImplementedError(
                    "context parallel: stacking subsampling unsupported "
                    "(use dw_striding/striding)"
                )
            SubCls = StackingSubsampling
            sub_kw = dict(
                subsampling_factor=self.subsampling_factor,
                feat_in=self.feat_in,
                feat_out=self.d_model,
                norm=not self.subsampling_norm_out,
                norm_out=self.subsampling_norm_out,
                dtype=self.dtype,
            )
        else:
            SubCls = ConvSubsampling
            sub_kw = dict(
                # forward the MODE — without it a 'striding'/'vggnet' config
                # silently built the default dw_striding chain (is_causal
                # stays component-level, as in the reference model)
                subsampling=self.subsampling,
                subsampling_factor=self.subsampling_factor,
                feat_in=self.feat_in,
                feat_out=self.d_model,
                conv_channels=(
                    self.subsampling_conv_channels
                    if self.subsampling_conv_channels != -1
                    else self.d_model
                ),
                activation=self.subsampling_act,
                norm_out=self.subsampling_norm_out,
                seq_axis_name=self.seq_axis_name,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
            )
        if self.remat_subsampling:
            SubCls = nn.remat(SubCls, prevent_cse=False)
        sub = SubCls(**sub_kw, name="subsampling")
        x, length = sub(x, length)
        N = x.shape[1]

        # context parallel: N is the LOCAL shard length; positions/masks run
        # at global coordinates off + [0, N)
        cp = self.seq_axis_name
        off = jax.lax.axis_index(cp) * N if cp is not None else 0

        lengths_arg = length if have_lengths else None
        pad_mask = (~length_mask(length, N, offset=off)) if have_lengths else None

        rotary = None
        if self.use_rotary:
            rotary = RotaryEmbedding(
                dim=self.head_dim,
                base=self.rotary_base_freq,
                learned_freq=self.learned_rotary,
                interpolation_factor=self.rotary_interpolation_factor,
                name="rotary_pos_emb",
            )(N, dtype=jnp.float32, offset=off)

        if self.fourier_pos_enc:
            from lcasr_tpu.models.positional import LearnableFourierPosEnc

            # context parallel: local row r is global row off + r — the
            # encoder's per-sample offset input shifts the scalar positions
            x = LearnableFourierPosEnc(
                self.d_model, dtype=self.dtype, name="fourier_pos_enc"
            )(x, offsets=jnp.full((B,), off) if cp is not None else None)

        decoder = ASRLinearSCDecoder(
            d_model=self.d_model,
            vocab_size=self.vocab_size,
            norm=self.decoder_norm,
            norm_type=self.default_norm,
            quant_w8a8=quant_site(self.quant_w8a8, "decoder"),
            dtype=self.dtype,
            name="decoder",
        )

        remat_kwargs = {}
        if self.remat_policy == "dots":
            remat_kwargs["policy"] = jax.checkpoint_policies.dots_saveable
        elif self.remat_policy != "nothing":
            raise ValueError(f"remat_policy must be nothing|dots, got {self.remat_policy}")
        RematLayer = nn.remat(
            ConformerLayer, static_argnums=(5,), prevent_cse=False, **remat_kwargs
        )

        for i in range(self.n_layers):
            use_remat = (
                self.checkpoint_every_n_layers > 0
                and i % self.checkpoint_every_n_layers == 0
            )
            layer = (RematLayer if use_remat else ConformerLayer)(
                d_model=self.d_model,
                n_heads=self.n_heads,
                head_dim=self.head_dim,
                conv_kernel_size=self.conv_kernel_size,
                expansion_factor=self.expansion_factor,
                conv_expansion_factor=self.conv_expansion_factor,
                conv_norm=self.conv_norm,
                conv_type=self.conv_type,
                longconv_weight_init=self.longconv_weight_init,
                longconv_position_kernel=self.longconv_position_kernel,
                longconv_ma_smoothing=self.longconv_ma_smoothing,
                longconv_ma_window_len=self.longconv_ma_window_len,
                longconv_smooth_freq=self.longconv_smooth_freq,
                default_norm=self.default_norm,
                sandwich_norm=self.sandwich_norm,
                bias_in_ff=self.bias_in_ff,
                transformer=self.transformer,
                window=self.window,
                dropout_ff=self.dropout_ff,
                dropout_conv=self.dropout_conv,
                dropout_attn=self.dropout_attn,
                use_pallas=self.use_pallas,
                return_attention_weights=self.return_attention_weights,
                capture_qkv=self.capture_qkv,
                seq_axis_name=self.seq_axis_name,
                attention_cp_impl=self.attention_cp_impl,
                stat_axes=self.stat_axes,
                quant_w8a8=self.quant_w8a8,
                dtype=self.dtype,
                name=f"layers_{i}",
            )
            x = layer(x, lengths_arg, pad_mask, rotary, train)

            if i != self.n_layers - 1 and self.self_conditioning:
                interim_logits = decoder(x, logits=True)
                interim_posts = jax.nn.softmax(
                    interim_logits.astype(jnp.float32), axis=-1
                ).astype(x.dtype)
                x = decoder.integrate_projections(x, decoder.project_back(interim_posts))

        # "legasee double norm": decoder norm applied both here and inside the
        # decoder call — kept for checkpoint compatibility (reference :246-247)
        if self.legasee_double_norm:
            x = decoder.apply_norm(x)
        final_posts = decoder(x, logits=return_logits)

        return {"final_posteriors": final_posts, "length": length}
