"""MoTIF — continuous space-time video super-resolution (the reference's
flagship `LunaTokis`, models/modules/Ours.py:412-858), rebuilt TPU-first.

Pipeline (Ours.py:512-858, SURVEY.md §3.3):
  RAFT flow on the two LR center frames (4 directed pairs, at HR scale)
  → reliability metrics psi_photo / psi_flow / psi_var ("Z")
  → ZSM conv encoder (features + center residual)
  → flow-context encoder (flow_process)
  → LIIF query: nearest-upsample of [feat | flow_feat | coord | residual]
    to the HR grid + relative-coordinate conditioning
  → STINF SIREN (flow_imnet): HR motion (dx, dy) + importance Z per time
  → SINF SIREN (imnet): HR spatial features
  → softmax splatting of HR features along predicted (or teacher) motion
  → SIREN synthesis decoder → RGB.

TPU design notes:
 * NHWC + static (H, W, HH, WW, N); one jit per size bucket.
 * The reference's `grid_sample(nearest)` LIIF upsampling over a regular
   grid is computed as two separable takes (exact same values, no gather).
 * SIREN evaluations are token matmuls on the MXU; the splat is the
   corner-scatter op from ops/softsplat.py.
 * All `setting` flags of the reference are supported (Ours.py:455-459);
   the released model is setting=5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from motif_tpu.models.layers import Conv2d, LateralBlock, lrelu
from motif_tpu.models.raft import RAFT
from motif_tpu.models.encoder import ZSMEncoder
from motif_tpu.models.siren import Siren
from motif_tpu.ops.resize import interpolate_bilinear
from motif_tpu.ops.softsplat import splat_fused
from motif_tpu.ops.warp import backwarp


def make_coord_1d(n: int) -> np.ndarray:
    """Cell-center coordinates in [-1, 1] (Ours.py:874-889, per axis)."""
    r = 1.0 / n
    return (-1.0 + r + 2.0 * r * np.arange(n)).astype(np.float64)


def liif_nearest_axis(src: int, dst: int, eps: float = 1e-6):
    """Nearest-cell index + scaled relative coordinate for one axis of the
    LIIF query (Ours.py:667-722), computed analytically.

    Reproduces: coord = clamp(make_coord(dst) + eps, -1+1e-6, 1-1e-6);
    idx = nearest source cell under grid_sample(align_corners=False)
    (torch rounds half-to-even); rel = (make_coord(dst) - src_center) * src.
    """
    hr = make_coord_1d(dst)
    c = np.clip(hr + eps, -1 + 1e-6, 1 - 1e-6)
    pix = ((c + 1.0) * src - 1.0) / 2.0
    idx = np.clip(np.round(pix).astype(np.int64), 0, src - 1)
    src_center = make_coord_1d(src)[idx]
    rel = (hr - src_center) * src
    # float64 table; jnp.asarray downcasts to f32 unless x64 is enabled
    return idx.astype(np.int32), rel


def _chunked_tokens(net, toks: jax.Array, chunks: int) -> jax.Array:
    """Apply a per-token network over the token axis in `chunks` pieces.

    The reference bounds test-time LIIF memory by splitting the HR query
    grid into thirds and decoding each piece separately
    (models/modules/Sakuya_arch.py:486-599). The SIRENs here are pointwise
    over tokens, so splitting the token axis is exact math — it only bounds
    the live (tokens, 256)-wide hidden activations. chunks<=1 is the
    single-program default (XLA already schedules for minimal live memory;
    the knob is the escape hatch for very large HR outputs)."""
    T = toks.shape[1]
    if chunks <= 1 or T <= chunks:
        return net(toks)
    c = -(-T // chunks)
    return jnp.concatenate(
        [net(toks[:, i:i + c]) for i in range(0, T, c)], axis=1)


def _gauss_blur_reflect(x: jax.Array) -> jax.Array:
    """3x3 gaussian ([1,2,1]⊗[1,2,1]/16) with reflect padding — the fixed
    g_filter conv (Ours.py:443-445, applied :572-577). x: (B, H, W, C)."""
    k1 = jnp.asarray([0.25, 0.5, 0.25], x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    xh = xp[:, :, :-2] * k1[0] + xp[:, :, 1:-1] * k1[1] + xp[:, :, 2:] * k1[2]
    return xh[:, :-2] * k1[0] + xh[:, 1:-1] * k1[1] + xh[:, 2:] * k1[2]


class MoTIF(nn.Module):
    """The MoTIF C-STVSR model. Param tree mirrors the reference module
    names so `best.pth` ports mechanically (checkpoint.py).

    n_anchors selects the variant family:
      * 2 — `Ours` (models/modules/Ours.py): the two center frames anchor
        the flows; residual = the encoder's middle fused frame.
      * 4 — `Ours_44` (models/modules/Ours_44.py, the reference's Vimeo
        training model): all four input frames anchor 16 directed flows,
        anchor positions [0,2,4,6]/6, and the residual is the encoder
        output indexed by round(t*6) per target time; teacher flows come
        precomputed from the dataset (`flows=` argument).
    """
    setting: int = 5
    channel: int = 64
    # encoder trunk depths (reference front_RBs=5 / back_RBs=40,
    # Ours.py:351,357); shrunk only by the multichip dryrun / tiny tests
    front_rbs: int = 5
    back_rbs: int = 40
    groups: int = 1
    n_anchors: int = 2
    siren: bool = True
    trans: bool = False
    res_liff: bool = False
    local_ensemble: bool = False
    fused_siren: bool = False  # Pallas fused-MLP SIREN evaluation (TPU)
    # Ours_7 (models/modules/Ours_7.py:480-704): anchors are the FIRST two
    # input frames; target-time motion is a linear time-scaling of the two
    # directed flows (f01*t, f10*(1-t)) instead of the STINF prediction; the
    # LIIF query drops the flow-context features; no reliability metrics.
    # The reference fork hardcodes input_Z=True, predict_Z=decoder_Z=False,
    # i.e. use setting=3 with this flag.
    linear_motion: bool = False
    # Fused LIIF decode: exact-math reordering that folds the STINF/SINF
    # SIREN first layers through the nearest-upsample so the wide HR concat
    # inputs never materialize (see the use_fused block below). Off by
    # default so parity gates see the reference's float-op order; the
    # serving/bench configuration turns it on.
    fused_decode: bool = False
    # Splat scatter backend (ops/softsplat.py::splat_fused): 'scan' is the
    # memory-lean training default; 'base' does one scatter row per source
    # pixel + a dense shift-combine (~20% faster on v5e, ~4x live memory)
    # — the inference/serving setting.
    splat_method: str = "scan"
    # Narrower scatter accumulation dtype for the 'base' backend (e.g.
    # "float16" halves the scattered bytes; see splat_fused scatter_dtype).
    # None keeps the fp32 accumulation — the parity/training default.
    splat_dtype: str | None = None
    # RAFT input resolution factor. The reference upsamples the LR frames to
    # full HR, runs RAFT, then downsamples the flow back to LR
    # (Ours.py:540-554) — all the information content is LR, so the HR pass
    # mostly buys RAFT a finer internal grid (HR/8). 0.5 runs RAFT at HR/2
    # (internal grid HR/16 = LR/4): ~4x cheaper flow at a small accuracy
    # cost that must be PSNR-gated per deployment; 1.0 is reference-faithful
    # and the parity default. Only affects the live-RAFT path (precomputed
    # flows bypass it).
    raft_resolution: float = 1.0
    # Decode the HR LIIF/SIREN token MLPs in this many token-axis chunks —
    # the reference's query-thirds memory bound (Sakuya_arch.py:486-599),
    # exact math (the SIRENs are pointwise over tokens). 1 = single program.
    decode_chunks: int = 1
    # Mixed-precision compute: None keeps every stage in the input dtype
    # (fp32/fp64 — the parity configuration). "bfloat16" runs the conv
    # trunk, RAFT, LIIF gathers and SIRENs in bf16 (half the HBM traffic,
    # full-rate MXU) while flow values, reliability metrics, the splat
    # accumulation and the final frames stay fp32 — the numerically
    # sensitive parts (exp(z) normalisation, scatter-add ordering).
    compute_dtype: str | None = None

    @property
    def warp_to_many(self) -> bool:
        return self.setting >= 6

    @property
    def decoder_Z(self) -> bool:
        return self.setting >= 5

    @property
    def predict_Z(self) -> bool:
        return self.setting >= 4

    @property
    def input_Z(self) -> bool:
        return self.setting >= 3

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                       # (B, N_in, H, W, 3) LR frames
        target_t: jax.Array,                # (B, N) times in [0, 1]
        out_hw: tuple[int, int],            # (HH, WW) static
        use_gt: bool = False,
        iters: int = 12,
        target_frames: jax.Array | None = None,  # (B, N+2, HH, WW, 3) train
        train: bool = False,
        flows: tuple | None = None,  # (lr_flow (B,n²,H,W,2), flow_gt (B,N,n,HH,WW,2))
    ):
        B, N_in, H, W, _ = x.shape
        HH, WW = out_hw
        N = target_t.shape[1]
        G = self.groups
        ch = self.channel
        n = self.n_anchors
        # G>1 reproduces the channel-split math of Ours.py:783-791: the
        # STINF output is read in per-group (flow_x, flow_y, z) slices, the
        # SINF/feat_low features are split into G channel groups, each group
        # splats with its own flow, and the groups' warped channels are
        # re-concatenated for the synth net. NB the reference's own G>1 is
        # dead code that would CRASH upstream (the hardcoded synth_net
        # in_features 192+5G at Ours.py:476,487 mismatches the actual concat
        # width for any G>=2) — flax infers in_features lazily, so this
        # build executes the Ours.py:783-791 math where the reference
        # cannot. Every reference config and best.pth use groups=1
        # (Ours.py:449). The fused-decode/warp_to_many layouts assume G=1.
        if G != 1 and (self.fused_decode or self.warp_to_many):
            raise NotImplementedError(
                "MoTIF groups>1 is only supported with fused_decode=False "
                "and warp_to_many=False (the fused splat-payload fold and "
                "the warp_to_many merge, Ours.py:819-824, assume G=1).")
        assert n in (2, 4)
        # anchor time positions / rsd divisor (Ours.py:615-621 [0,8]/8;
        # Ours_44.py [0,2,4,6]/6)
        positions = [0.0, 8.0] if n == 2 else [0.0, 2.0, 4.0, 6.0]
        rsd_div = positions[-1]  # 8.0 (Ours) / 6.0 (Ours_44)
        n2 = n * n

        # mixed precision (see compute_dtype): cd casts INTO the compute
        # dtype, cf casts back to the input dtype. Both are identity when
        # compute_dtype is unset so the fp32/fp64 parity path is untouched.
        cdt = getattr(jnp, self.compute_dtype) if self.compute_dtype else None
        cd = (lambda a: a.astype(cdt)) if cdt is not None else (lambda a: a)
        cf = (lambda a: a.astype(x.dtype)) if cdt is not None else (lambda a: a)

        raft = RAFT(name="flow_predictor")
        if (self.is_initializing() and flows is not None
                and flows[0] is not None and flows[-1] is not None):
            # Precomputed flows bypass RAFT at train time, but the param tree
            # must still contain flow_predictor (the reference Ours_44 always
            # owns RAFT — eval computes flows live and best.pth has
            # flow_predictor.* keys). Initialize it on a minimal dummy: 64 px
            # is the smallest input the 4-level corr pyramid accepts.
            dummy = jnp.zeros((1, 64, 64, 3), x.dtype)
            _ = raft(dummy, dummy, iters=1)

        # anchor frames: the two center frames for Ours (Ours.py:516), all
        # four inputs for Ours_44, the FIRST two for Ours_7 (which skips the
        # center-crop line, Ours_7.py:481-492)
        if self.linear_motion:
            assert n == 2, "linear_motion is the 2-anchor Ours_7 fork"
            frames = [x[:, 0], x[:, 1]]
        elif n == 2:
            c = N_in // 2
            frames = [x[:, c - 1], x[:, c]]
        else:
            assert N_in == 4
            frames = [x[:, i] for i in range(4)]

        if self.linear_motion:
            return self._linear_motion_forward(
                x, frames, target_t, out_hw, raft, use_gt, iters,
                target_frames, train)

        # ---- motion + reliability (no_grad block, Ours.py:519-595) ----
        if flows is not None and flows[0] is not None:
            # precomputed LR flows (Ours_44.py: dataset lr_flow npys)
            flow = flows[0].transpose(1, 0, 2, 3, 4).reshape(n2 * B, H, W, 2)
        else:
            # The reference runs RAFT on all n² directed pairs INCLUDING the
            # (i,i) self-pairs, then zeroes those flows (Ours.py:544,551-553).
            # Running only the n(n-1) cross pairs and filling exact zeros is
            # mathematically identical and drops 2/4 (n=2) or 4/16 (n=4) of
            # the flow-net cost.
            if self.raft_resolution != 1.0:
                # run RAFT on a reduced grid (multiple-of-8 for the 8x
                # feature stride); rescale flow per-component back to LR.
                RH = max(64, int(round(HH * self.raft_resolution / 8.0)) * 8)
                RW = max(64, int(round(WW * self.raft_resolution / 8.0)) * 8)
            else:
                RH, RW = HH, WW
            hr_frames = [interpolate_bilinear(f, (RH, RW)) for f in frames]
            pairs = [(i, j) for i in range(n) for j in range(n) if i != j]
            src = jnp.concatenate([hr_frames[i] for i, _ in pairs], 0)
            dst = jnp.concatenate([hr_frames[j] for _, j in pairs], 0)
            fl = cf(raft(cd(src * 255.0), cd(dst * 255.0), iters=iters))
            if (RH, RW) == (HH, WW):
                fl = interpolate_bilinear(fl, (H, W)) * (H / HH)
            else:
                fl = interpolate_bilinear(fl, (H, W)) * jnp.asarray(
                    [W / RW, H / RH], fl.dtype)
            fl = fl.reshape(len(pairs), B, H, W, 2)
            flow = jnp.zeros((n2, B, H, W, 2), fl.dtype)
            for k, (i, j) in enumerate(pairs):
                flow = flow.at[i * n + j].set(fl[k])
            flow = flow.reshape(n2 * B, H, W, 2)

        # psi_photo (Ours.py:562-563): warp the *target* frame back with the
        # flow and compare against the source frame.
        tgt = jnp.concatenate([frames[j] for _ in range(n) for j in range(n)], 0)
        srclr = jnp.concatenate([frames[i] for i in range(n) for _ in range(n)], 0)
        warped, _ = backwarp(tgt, flow, clip=True)
        psi_photo = jnp.abs(srclr - warped).mean(-1)
        # psi_flow (Ours.py:565-571): warp the reverse flow back and compare.
        f4 = flow.reshape(n2, B, H, W, 2)
        rev = jnp.concatenate([f4[j * n + i] for i in range(n) for j in range(n)], 0)
        warped_f, _ = backwarp(-rev, flow, clip=True)
        psi_flow = jnp.abs(flow - warped_f).mean(-1)
        # psi_var (Ours.py:572-577): local gaussian std of the flow field.
        sq_mean = _gauss_blur_reflect(flow ** 2)
        mean_sq = _gauss_blur_reflect(flow)
        psi_var = jnp.sqrt(jnp.clip(sq_mean - mean_sq ** 2, 1e-9)).mean(-1)
        psies = jnp.stack([psi_photo, psi_flow / 10.0, psi_var], axis=-1)  # (n²B,H,W,3)

        flow = jax.lax.stop_gradient(flow)
        psies = jax.lax.stop_gradient(psies)

        # teacher flow: Ours computes it live with RAFT at 128² (train only,
        # Ours.py:586-595); Ours_44 consumes the dataset's precomputed
        # hr_gt_flow (Ours_44.py flows branch).
        if flows is not None and flows[-1] is not None:
            fg = flows[-1]                                         # (B,N,n,HH,WW,2)
            flow_gt = fg.transpose(2, 0, 1, 3, 4, 5).reshape(n * B * N, HH, WW, 2)
            flow_gt = jax.lax.stop_gradient(flow_gt)
        elif train:
            # Live RAFT teacher at 128² from each anchor frame to each target
            # (Ours.py:586-595 endpoint anchors; the n=4 generalization
            # mirrors Ours_44.py:556-560's commented 4-anchor live teacher —
            # anchor frames are the GT frames at the anchor time positions).
            assert target_frames is not None
            tf = target_frames
            T = tf.shape[1]
            small = interpolate_bilinear(
                tf.reshape(B * T, HH, WW, 3), (128, 128)
            ).reshape(B, T, 128, 128, 3)
            aidx = [int(round(p / rsd_div * (T - 1))) for p in positions]
            t_frs = small[:, 1:-1]                                  # (B, N, ...)
            anchors = jnp.concatenate([
                jnp.repeat(small[:, k][:, None], N, 1).reshape(B * N, 128, 128, 3)
                for k in aidx], 0)
            targets = jnp.tile(t_frs.reshape(B * N, 128, 128, 3), (n, 1, 1, 1))
            flow_gt = cf(raft(cd(anchors * 255.0), cd(targets * 255.0),
                              iters=iters))
            flow_gt = interpolate_bilinear(flow_gt, (HH, WW)) * (HH / 128.0)
            flow_gt = jax.lax.stop_gradient(flow_gt)                # (nBN,HH,WW,2)
        else:
            flow_gt = jnp.zeros((n * B * N, HH, WW, 2), x.dtype)

        # ---- encoder (Ours.py:601-613 / Ours_44 residual-by-time) ----
        feat_t = ZSMEncoder(ch, self.front_rbs, self.back_rbs,
                            name="encoder")(cd(jnp.stack(frames, 1)))  # (B,2n-1,H,W,ch)
        if n == 2:
            residual_t = jnp.repeat(
                feat_t[:, feat_t.shape[1] // 2][:, None], N, axis=1)   # (B,N,H,W,ch)
        else:
            # Ours_44.py: residual = feat[:, round(t*6)] per target time
            idx = jnp.clip(jnp.round(target_t * 6.0).astype(jnp.int32), 0,
                           feat_t.shape[1] - 1)                         # (B,N)
            residual_t = jnp.take_along_axis(
                feat_t, idx[:, :, None, None, None], axis=1)            # (B,N,H,W,ch)
        feat = jnp.concatenate([feat_t[:, 2 * i] for i in range(n)], 0)  # (nB,H,W,ch)

        # ---- flow-context encoder (Ours.py:614-657) ----
        rsd = np.array([[positions[i], positions[j]] for i in range(n)
                        for j in range(n)], np.float32)
        if not self.trans:
            # per source frame i: concat over targets j of
            # [flow_ij/20 (2), psi_ij (3 if input_Z), rsd row (2)] → grouped conv.
            f22 = (flow / 20.0).reshape(n, n, B, H, W, 2).transpose(0, 2, 1, 3, 4, 5)
            p22 = psies.reshape(n, n, B, H, W, 3).transpose(0, 2, 1, 3, 4, 5)
            r22 = jnp.broadcast_to(
                jnp.asarray(rsd.reshape(n, 1, n, 1, 1, 2) / rsd_div),
                (n, B, n, H, W, 2)).astype(x.dtype)
            parts = [f22, p22, r22] if self.input_Z else [f22, r22]
            ff = jnp.concatenate(parts, axis=-1)                    # (n,B,n,H,W,7|4)
            ff = ff.reshape(n * B, n, H, W, -1).transpose(0, 2, 3, 1, 4)
            ff = ff.reshape(n * B, H, W, -1)                        # grouped by j
            y = Conv2d(ch, 3, 1, 1, groups=n, name="flow_process_0")(cd(ff))
            y = Conv2d(ch, 3, 1, 1, groups=2, name="flow_process_1")(y)
            y = lrelu(y)
            for i in range(3, 8):
                y = LateralBlock(ch, name=f"flow_process_{i}")(y)
            y = lrelu(y)
            flow_feat = Conv2d(ch, 3, 1, 1, padding_mode="reflect",
                               name="flow_process_9")(y)            # (nB,H,W,ch)
        else:
            p_parts = [(flow / 20.0)]
            if self.input_Z:
                p_parts.append(psies)
            p_parts.append(jnp.broadcast_to(
                jnp.asarray(rsd.reshape(n2, 1, 1, 1, 2) / rsd_div),
                (n2, B, H, W, 2)).reshape(n2 * B, H, W, 2).astype(x.dtype))
            ff = jnp.concatenate(p_parts, axis=-1)
            y = Conv2d(ch // 2, 3, 1, 1, name="flow_process_0")(cd(ff))
            y = Conv2d(ch, 3, 1, 1, name="flow_process_1")(y)
            y = lrelu(y)
            for i in range(3, 8):
                y = LateralBlock(ch, name=f"flow_process_{i}")(y)
            y = lrelu(y)
            ffe = Conv2d(ch, 3, 1, 1, padding_mode="reflect", name="flow_process_9")(y)
            wgt = LateralBlock(ch, name="weight_generator_0")(ffe)
            wgt = lrelu(wgt)
            wgt = Conv2d(G, 3, 1, 1, padding_mode="reflect", name="weight_generator_2")(wgt)
            wgt = wgt.reshape(n2, n2, B, H, W, G, 1)
            ffg = ffe.reshape(n2, n2, B, H, W, G, -1)
            wgt = jax.nn.softmax(wgt, axis=1)
            flow_feat = (ffg * wgt).sum(1).reshape(n2 * B, H, W, -1)

        # ---- LIIF query (Ours.py:659-783) as separable nearest takes ----
        # unused-but-checkpointed parameters (Ours.py:439-440,509-510)
        alpha = self.param("alpha", lambda k, s: jnp.full(s, -20.0), (1,))
        self.param("norm_gamma", nn.initializers.ones, (1, 3, 1))
        self.param("norm_beta", nn.initializers.zeros, (1, 3, 1))
        _ = Conv2d(ch, 1, 1, 0, name="shuffle")(jnp.zeros((1, 1, 1, ch), x.dtype))

        # nn.remat: the HR-token SIREN activations dominate the training
        # backward's memory (HH*WW tokens x n*B*N rows x 4 layers); remat
        # recomputes them from the (already-materialized) inputs instead.
        # Inference cost is unchanged (no backward pass).
        SirenR = nn.remat(Siren)
        # Fused LIIF decode (fused_decode flag): two exact-math reorderings
        # for TPU bandwidth —
        #  1. each SIREN's first linear layer is folded through the LIIF
        #     nearest-upsample (a channel matmul commutes with spatial
        #     takes), so the wide HR concat inputs (sti/si/synth_in) never
        #     materialize and the feature matmuls run at LR;
        #  2. the splat payload is projected through synth_net.net_0's rows
        #     BEFORE scattering (the splat is linear in its values),
        #     halving the scattered bytes (130+2 → 64+2 channels).
        # Off during init so every net_0 is created with its true fan-in;
        # off by default so the fp64 full-graph parity gates see the
        # reference's float-op order.
        use_fused = (self.fused_decode and self.siren and G == 1
                     and not self.local_ensemble and not self.res_liff
                     and not self.warp_to_many and not self.is_initializing())
        flow_imnet = SirenR([64, 64, 256], 2, 3 * G,
                            fused=self.fused_siren and not use_fused,
                            skip_first_linear=use_fused, name="flow_imnet")
        imnet = SirenR([64, 64, 256], 2, 64,
                       fused=self.fused_siren and not use_fused,
                       skip_first_linear=use_fused, name="imnet")
        if self.res_liff:
            res_imnet = SirenR([64, 64, 256], 2, 64, fused=self.fused_siren,
                               name="res_imnet")

        if self.local_ensemble:
            shifts = [(-1, -1), (-1, 1), (1, -1), (1, 1)]
        else:
            shifts = [(0, 0)]

        t_tokens = cd(jnp.tile(target_t.reshape(B * N, 1, 1, 1), (n, HH, WW, 1)))
        residual_bn = residual_t.reshape(B * N, H, W, ch)

        if use_fused:
            pvars = self.variables["params"]
            iy, rel_y = liif_nearest_axis(H, HH)
            ix, rel_x = liif_nearest_axis(W, WW)

            def up(img):  # nearest LIIF upsample via separable takes
                return jnp.take(jnp.take(img, iy, axis=1), ix, axis=2)

            rel = jnp.broadcast_to(
                jnp.stack(jnp.meshgrid(jnp.asarray(rel_y), jnp.asarray(rel_x),
                                       indexing="ij"), -1)[None],
                (1, HH, WW, 2)).astype(cdt or x.dtype)

            def rep_n(a):  # (nB, HH, WW, c) -> (nBN, HH, WW, c)
                c = a.shape[-1]
                return (jnp.repeat(a, N, axis=0)
                        .reshape(n, B, N, HH, WW, c)
                        .reshape(n * B * N, HH, WW, c))

            # STINF pre-activation: net_0 rows follow the original concat
            # [flow_feat(ch) | t(1) | rel(2)] (Ours.py:727-730).
            wq = cd(pvars["flow_imnet"]["net_0"]["linear"]["kernel"])
            bq = cd(pvars["flow_imnet"]["net_0"]["linear"]["bias"])
            h0 = rep_n(up(jnp.einsum("bhwc,cd->bhwd", flow_feat, wq[:ch])))
            h0 = h0 + t_tokens * wq[ch] \
                + jnp.einsum("bhwc,cd->bhwd", rel, wq[ch + 1:]) + bq
            sti_out = _chunked_tokens(
                flow_imnet, h0.reshape(n * B * N, HH * WW, -1),
                self.decode_chunks)

            # SINF pre-activation: rows [feat(ch) | rel(2)] (Ours.py:731-733).
            wi = cd(pvars["imnet"]["net_0"]["linear"]["kernel"])
            bi = cd(pvars["imnet"]["net_0"]["linear"]["bias"])
            g0 = up(jnp.einsum("bhwc,cd->bhwd", feat, wi[:ch]))
            g0 = g0 + jnp.einsum("bhwc,cd->bhwd", rel, wi[ch:]) + bi
            si_out = _chunked_tokens(
                imnet, g0.reshape(n * B, HH * WW, -1), self.decode_chunks)

            q_feat_o = si_out.reshape(n * B, HH, WW, 64)
            # q_feat_low / q_residual are not materialized at HR here: the
            # synth-fold below projects feat / residual_bn at LR instead.
            q_flow_o = sti_out.reshape(n * B * N, HH, WW, 3 * G)

        preds, areas = [], []
        for vy, vx in shifts if not use_fused else []:
            ey = 1e-6 + vy * (1.0 / H)   # vx*rx with rx = 2/H/2 (Ours.py:674)
            ex = 1e-6 + vx * (1.0 / W)
            iy, rel_y = liif_nearest_axis(H, HH, ey)
            ix, rel_x = liif_nearest_axis(W, WW, ex)

            def up(img):  # nearest LIIF upsample via separable takes
                return jnp.take(jnp.take(img, iy, axis=1), ix, axis=2)

            rel = jnp.broadcast_to(
                jnp.stack(jnp.meshgrid(jnp.asarray(rel_y), jnp.asarray(rel_x),
                                       indexing="ij"), -1)[None],
                (1, HH, WW, 2)).astype(cdt or x.dtype)

            q_feat = up(feat)                                       # (nB,HH,WW,ch)
            q_flow_feat = up(flow_feat)                             # (nB,HH,WW,ch)
            q_residual = up(residual_bn)                            # (BN,HH,WW,ch)

            # STINF input: [flow_feat | t | rel] (Ours.py:727-730)
            sti = jnp.concatenate([
                jnp.repeat(q_flow_feat, N, axis=0)
                   .reshape(n, B, N, HH, WW, ch).reshape(n * B * N, HH, WW, ch),
                t_tokens,
                jnp.tile(rel, (n * B * N, 1, 1, 1)),
            ], axis=-1)
            # SINF input: [feat | rel] (Ours.py:731-733)
            si = jnp.concatenate([q_feat, jnp.tile(rel, (n * B, 1, 1, 1))], -1)

            sti_out = _chunked_tokens(
                flow_imnet, sti.reshape(n * B * N, HH * WW, -1),
                self.decode_chunks)
            si_out = _chunked_tokens(
                imnet, si.reshape(n * B, HH * WW, -1), self.decode_chunks)
            pred = [si_out.reshape(n * B, HH, WW, 64),
                    q_feat,
                    q_residual,
                    sti_out.reshape(n * B * N, HH, WW, 3 * G)]
            if self.res_liff:
                ri = jnp.concatenate([q_residual, jnp.tile(rel, (B * N, 1, 1, 1))], -1)
                pred.append(_chunked_tokens(
                    res_imnet, ri.reshape(B * N, HH * WW, -1),
                    self.decode_chunks).reshape(B * N, HH, WW, 64))
                pred = [pred[0], pred[1], pred[4], pred[3], pred[2]]
            preds.append(pred)
            areas.append(jnp.abs(rel[..., 0] * rel[..., 1]) + 1e-9)

        if not use_fused:
            tot = sum(areas)
            if self.local_ensemble:  # diagonal-swap weighting (Ours.py:758-764)
                areas = [areas[3], areas[2], areas[1], areas[0]]
            acc = [0.0] * len(preds[0])
            for pred, area in zip(preds, areas):
                w = (area / tot)[..., None]
                for i, p in enumerate(pred):
                    acc[i] = acc[i] + p * w.astype(p.dtype)
            if self.res_liff:
                q_feat_o, q_feat_low, q_res_liif, q_flow_o, q_res_low = acc
                q_residual = jnp.concatenate([q_res_liif, q_res_low], -1)
            else:
                q_feat_o, q_feat_low, q_residual, q_flow_o = acc

        # ---- HR flow / z / features (Ours.py:783-797) ----
        # flow values and the splat run in fp32 even under compute_dtype
        # (sub-pixel positions + scatter accumulation are precision-bearing).
        def split_groups(a, k):
            # NHWC equivalent of the reference's NCHW channel-split reshape
            # (Ours.py:783): (M,HH,WW,G*k) -> (M*G,HH,WW,k); group g takes
            # channel slice [g*k:(g+1)*k]. A bare NHWC reshape would
            # interleave pixels, so G>1 needs the explicit transpose.
            M = a.shape[0]
            if G == 1:
                return a.reshape(M, HH, WW, k)
            return (a.reshape(M, HH, WW, G, k).transpose(0, 3, 1, 2, 4)
                    .reshape(M * G, HH, WW, k))

        flow_raw = split_groups(cf(q_flow_o), 3)
        if use_fused:
            # Fold synth_net.net_0 through the splat (fused_decode point 2):
            # scatter-add is linear in its payload, so projecting the 130-ch
            # [q_feat_o | flow | q_feat_low] stack through net_0's matching
            # rows BEFORE splatting is exact math — the scattered rows
            # shrink 130+2 → 64+2 and the HR feature/residual stacks never
            # materialize (q_feat_low / residual projections run at LR and
            # ride the nearest-upsample takes; extra/residual/t rows are
            # added to the merged splat output below, before the division-
            # free part of net_0's sine).
            ws_raw = pvars["synth_net"]["net_0"]["linear"]["kernel"]  # (198,64)
            bs = cd(pvars["synth_net"]["net_0"]["linear"]["bias"])
            ws = cd(ws_raw)
            w_a, w_b = ws[:64], ws[66:66 + ch]
            off = 66 + ch
            k_e = 3 if self.decoder_Z else 2
            w_e = ws[off:off + k_e]
            w_r = ws[off + k_e:off + k_e + ch]
            w_t = ws[off + k_e + ch]
            pay = rep_n(jnp.einsum("bhwc,cd->bhwd", q_feat_o, w_a)
                        + up(jnp.einsum("bhwc,cd->bhwd", feat, w_b)))
            feat_hr = cf(pay) + jnp.einsum(
                "bhwc,cd->bhwd", jax.lax.stop_gradient(flow_raw[..., :2]),
                ws_raw[64:66].astype(flow_raw.dtype))   # (nBN,HH,WW,64)
        else:
            # Each group g sees its channel slice of q_feat / q_feat_low
            # repeated per target time (Ours.py:789-791: channel-tile by N
            # then the NCHW batch reshape => batch (dir,b,t,g) gets channels
            # [g*c/G:(g+1)*c/G]).
            def rep_split(a, c):      # (nB,HH,WW,c) -> (nBNG,HH,WW,c//G)
                return split_groups(jnp.repeat(a, N, axis=0), c // G)

            feat_hr = jnp.concatenate([
                rep_split(cf(q_feat_o), 64),
                jax.lax.stop_gradient(flow_raw[..., :2]),
                rep_split(cf(q_feat_low), ch),
            ], axis=-1)                                 # (nBNG,HH,WW,130//G+2-ish)

        flow_hr = flow_raw[..., :2] * 20.0 * (HH / H)
        z = jax.nn.relu(flow_raw[..., 2:3]) * alpha
        if not self.predict_Z:
            z = jnp.zeros_like(z)

        # ---- splat (Ours.py:799-806) ----
        # Every group shares the same GT flow (Ours.py:788: channel-tile by
        # G then the batch reshape). Repeat unconditionally for G > 1 so the
        # returned flow_gt_norm always lines up with the (nBNG,...)
        # flow_norm — at pure eval flow_gt is all-zeros and the repeat is
        # semantically free, but a shape mismatch would break any eval-time
        # flow metric.
        if G > 1:
            flow_gt = jnp.repeat(flow_gt, G, axis=0)
        splat_flow = flow_gt if use_gt else flow_hr
        # z = relu(x)*alpha is <= 0 whenever alpha <= 0 (and z == 0 when
        # predict_Z is off), making the max-splat identically 1 — an exact
        # runtime shortcut (see splat_fused docstring).
        z_all_nonpos = (alpha[0] <= 0.0) if self.predict_Z else jnp.asarray(True)
        output, warped_z, z_max, count = splat_fused(
            feat_hr, splat_flow, z, z_nonpositive=z_all_nonpos,
            method=self.splat_method,
            scatter_dtype=getattr(jnp, self.splat_dtype) if self.splat_dtype
            else None)

        # ---- merge directions + extras (Ours.py:810-836) ----
        Cf = output.shape[-1]
        if not self.warp_to_many:
            output = output.reshape(n, B * N * G, HH, WW, Cf).sum(0)
            warped_z = warped_z.reshape(n, B * N * G, HH, WW, 1).sum(0)
            warped_z = jnp.where(warped_z == 0.0, 1.0, warped_z)
            output = output / warped_z
            z_max = z_max.reshape(n, B * N * G, HH, WW, 1).max(0)
            count = count.reshape(n, B * N * G, HH, WW, 1).sum(0)
        else:
            warped_z = jnp.where(warped_z == 0.0, 1.0, warped_z)
            output = output / warped_z

        count_safe = jnp.where(count == 0.0, 1.0, count)
        warped_z_masked = jnp.where(warped_z == 1.0, 0.0, warped_z)
        if self.decoder_Z:
            extra = jnp.concatenate([z_max, count / 16.0, warped_z_masked / count_safe], -1)
        else:
            extra = jnp.concatenate([count / 16.0, warped_z_masked / count_safe], -1)

        # ---- synthesis (Ours.py:838-856) ----
        if use_fused:
            # net_0 pre-activation: merged splat output (already projected
            # through w_a/w_f/w_b) + the extra/residual/time rows + bias.
            h = (cd(output).reshape(B * N, HH, WW, 64)
                 + jnp.einsum("bhwc,cd->bhwd",
                              cd(extra).reshape(B * N, HH, WW, -1), w_e)
                 + up(jnp.einsum("bhwc,cd->bhwd", cd(residual_bn), w_r))
                 + cd(target_t).reshape(B * N, 1, 1, 1) * w_t[None, None, None]
                 + bs)
            synth = nn.remat(Siren)([64, 64, 64, 256], 3, 3,
                                    skip_first_linear=True, name="synth_net")
            out = _chunked_tokens(
                synth, h.reshape(B * N, HH * WW, -1),
                self.decode_chunks).reshape(B * N, HH, WW, 3)
            frames = jnp.clip(cf(out).reshape(B, N, HH, WW, 3),
                              0.0, 1.0).transpose(1, 0, 2, 3, 4)
            flow_norm = flow_hr / 20.0 / (HH / H)
            flow_gt_norm = flow_gt / 20.0 / (HH / H)
            return frames, flow_norm, flow_gt_norm

        def merge_groups(a):
            # (BNG,HH,WW,c) -> (BN,HH,WW,G*c): re-concatenate the groups'
            # warped channels, groups-major (the reference's NCHW
            # output.reshape(B*N,-1,HH,WW), Ours.py:841).
            if G == 1:
                return a.reshape(B * N, HH, WW, -1)
            c = a.shape[-1]
            return (a.reshape(B * N, G, HH, WW, c).transpose(0, 2, 3, 1, 4)
                    .reshape(B * N, HH, WW, G * c))

        res_rep = q_residual.reshape(B * N, HH, WW, -1)  # already per-time
        tmap = cd(target_t.reshape(B * N, 1, 1, 1)
                  * jnp.ones((1, HH, WW, 1), x.dtype))
        if not self.warp_to_many:
            synth_in = jnp.concatenate([
                merge_groups(cd(output)),
                merge_groups(cd(extra)),
                res_rep, tmap], -1)
        else:
            synth_in = jnp.concatenate([
                cd(output).reshape(n, B * N, HH, WW, -1).transpose(1, 0, 2, 3, 4)
                      .reshape(B * N, HH, WW, -1),
                cd(extra).reshape(n, B * N, HH, WW, -1).transpose(1, 0, 2, 3, 4)
                      .reshape(B * N, HH, WW, -1),
                res_rep, tmap], -1)

        if self.siren:
            synth = nn.remat(Siren)([64, 64, 64, 256], 3, 3, fused=self.fused_siren,
                                    name="synth_net")
            out = _chunked_tokens(
                synth, synth_in.reshape(B * N, HH * WW, -1),
                self.decode_chunks).reshape(B * N, HH, WW, 3)
        else:
            y = Conv2d(ch * 2, 3, 1, 1, name="synth_net_0")(synth_in)
            y = Conv2d(ch * 2, 3, 1, 1, name="synth_net_1")(y)
            y = Conv2d(ch, 3, 1, 1, name="synth_net_2")(y)
            y = lrelu(y)
            for i in range(4, 9):
                y = LateralBlock(ch, name=f"synth_net_{i}")(y)
            y = lrelu(y)
            out = Conv2d(3, 3, 1, 1, padding_mode="reflect", name="synth_net_10")(y)

        frames = jnp.clip(cf(out).reshape(B, N, HH, WW, 3), 0.0, 1.0).transpose(1, 0, 2, 3, 4)
        flow_norm = flow_hr / 20.0 / (HH / H)
        flow_gt_norm = flow_gt / 20.0 / (HH / H)
        return frames, flow_norm, flow_gt_norm

    def _linear_motion_forward(self, x, frames, target_t, out_hw, raft,
                               use_gt, iters, target_frames, train):
        """The Ours_7 fork (models/modules/Ours_7.py:480-704): target-time
        motion = linear time-scaling of the two directed flows; LIIF query
        without flow-context; no reliability metrics."""
        B, N_in, H, W, _ = x.shape
        HH, WW = out_hw
        N = target_t.shape[1]
        ch = self.channel

        # directed flows f01 / f10 at HR, downsampled (Ours_7.py:497-505)
        hr0 = interpolate_bilinear(frames[0], (HH, WW))
        hr1 = interpolate_bilinear(frames[1], (HH, WW))
        f = raft(jnp.concatenate([hr0, hr1], 0) * 255.0,
                 jnp.concatenate([hr1, hr0], 0) * 255.0, iters=iters)
        f = interpolate_bilinear(f, (H, W)) * (H / HH)
        f01, f10 = f[:B], f[B:]
        # per-target-time linear scaling then HR upsample (Ours_7.py:507-515)
        t = target_t.reshape(1, B, N, 1, 1, 1)
        lin = jnp.concatenate([
            (f01[None, :, None] * t),
            (f10[None, :, None] * (1.0 - t)),
        ], 0).reshape(2 * B * N, H, W, 2)
        flow = interpolate_bilinear(lin, (HH, WW)) * (HH / H)
        flow = jax.lax.stop_gradient(flow)                  # (2BN, HH, WW, 2)

        # teacher flow (training): identical to the Ours path
        if train:
            assert target_frames is not None
            tf = target_frames
            small = interpolate_bilinear(
                tf.reshape(B * tf.shape[1], HH, WW, 3), (128, 128)
            ).reshape(B, tf.shape[1], 128, 128, 3)
            anchors = jnp.concatenate([
                jnp.repeat(small[:, 0][:, None], N, 1).reshape(B * N, 128, 128, 3),
                jnp.repeat(small[:, -1][:, None], N, 1).reshape(B * N, 128, 128, 3),
            ], 0)
            targets = jnp.tile(small[:, 1:-1].reshape(B * N, 128, 128, 3),
                               (2, 1, 1, 1))
            flow_gt = raft(anchors * 255.0, targets * 255.0, iters=iters)
            flow_gt = interpolate_bilinear(flow_gt, (HH, WW)) * (HH / 128.0)
            flow_gt = jax.lax.stop_gradient(flow_gt)
        else:
            flow_gt = jnp.zeros((2 * B * N, HH, WW, 2), x.dtype)

        # encoder on the two anchors (Ours_7.py:560-566)
        feat_t = ZSMEncoder(ch, self.front_rbs, self.back_rbs,
                            name="encoder")(jnp.stack(frames, 1))
        residual_bn = feat_t[:, 1]                           # (B, H, W, ch)
        feat = jnp.concatenate([feat_t[:, 0], feat_t[:, 2]], 0)

        # checkpointed-but-unused params of the fork (flow encoder + STINF)
        alpha = self.param("alpha", lambda k, s: jnp.full(s, -20.0), (1,))
        self.param("norm_gamma", nn.initializers.ones, (1, 3, 1))
        self.param("norm_beta", nn.initializers.zeros, (1, 3, 1))
        _ = Conv2d(ch, 1, 1, 0, name="shuffle")(jnp.zeros((1, 1, 1, ch), x.dtype))
        if self.is_initializing():
            zf = jnp.zeros((1, 1, 1, 14), x.dtype)
            y = Conv2d(ch, 3, 1, 1, groups=2, name="flow_process_0")(zf)
            y = Conv2d(ch, 3, 1, 1, groups=2, name="flow_process_1")(y)
            for i in range(3, 8):
                y = LateralBlock(ch, name=f"flow_process_{i}")(y)
            _ = Conv2d(ch, 3, 1, 1, padding_mode="reflect",
                       name="flow_process_9")(y)
            _ = Siren([64, 64, 256], 2, 3, fused=self.fused_siren,
                      name="flow_imnet")(jnp.zeros((1, 1, 67), x.dtype))

        imnet = Siren([64, 64, 256], 2, 64, fused=self.fused_siren, name="imnet")

        # LIIF query without flow-context (Ours_7.py:567-616; eps 1e-6 only)
        iy, rel_y = liif_nearest_axis(H, HH)
        ix, rel_x = liif_nearest_axis(W, WW)

        def up(img):
            return jnp.take(jnp.take(img, iy, axis=1), ix, axis=2)

        rel = jnp.broadcast_to(
            jnp.stack(jnp.meshgrid(jnp.asarray(rel_y), jnp.asarray(rel_x),
                                   indexing="ij"), -1)[None],
            (1, HH, WW, 2)).astype(x.dtype)
        q_feat = up(feat)
        q_residual = up(residual_bn)
        si = jnp.concatenate([q_feat, jnp.tile(rel, (2 * B, 1, 1, 1))], -1)
        si_out = _chunked_tokens(
            imnet, si.reshape(2 * B, HH * WW, -1),
            self.decode_chunks).reshape(2 * B, HH, WW, 64)

        # splat (Ours_7.py:627-659): features [si_out | flow | raw feat]
        feat_hr = jnp.concatenate([
            jnp.repeat(si_out, N, 0).reshape(2, B, N, HH, WW, 64)
               .reshape(2 * B * N, HH, WW, 64),
            jax.lax.stop_gradient(flow),
            jnp.repeat(q_feat, N, 0).reshape(2, B, N, HH, WW, ch)
               .reshape(2 * B * N, HH, WW, ch),
        ], -1)
        z = jax.nn.relu(flow[..., -1:]) * alpha
        if not self.predict_Z:                # the fork hardcodes False
            z = jnp.zeros_like(z)
        splat_flow = flow_gt if use_gt else flow
        z_all_nonpos = (alpha[0] <= 0.0) if self.predict_Z else jnp.asarray(True)
        output, warped_z, z_max, count = splat_fused(
            feat_hr, splat_flow, z, z_nonpositive=z_all_nonpos,
            method=self.splat_method,
            scatter_dtype=getattr(jnp, self.splat_dtype) if self.splat_dtype
            else None)

        Cf = output.shape[-1]
        output = output.reshape(2, B * N, HH, WW, Cf).sum(0)
        warped_z = warped_z.reshape(2, B * N, HH, WW, 1).sum(0)
        warped_z = jnp.where(warped_z == 0.0, 1.0, warped_z)
        output = output / warped_z
        z_max = z_max.reshape(2, B * N, HH, WW, 1).max(0)
        count = count.reshape(2, B * N, HH, WW, 1).sum(0)

        count_safe = jnp.where(count == 0.0, 1.0, count)
        warped_z_masked = jnp.where(warped_z == 1.0, 0.0, warped_z)
        if self.decoder_Z:
            extra = jnp.concatenate([z_max, count / 16.0,
                                     warped_z_masked / count_safe], -1)
        else:
            extra = jnp.concatenate([count / 16.0,
                                     warped_z_masked / count_safe], -1)

        res_rep = jnp.repeat(q_residual, N, 0).reshape(B * N, HH, WW, -1)
        tmap = target_t.reshape(B * N, 1, 1, 1) * jnp.ones((1, HH, WW, 1), x.dtype)
        synth_in = jnp.concatenate([output, extra, res_rep, tmap], -1)
        synth = Siren([64, 64, 64, 256], 3, 3, fused=self.fused_siren,
                      name="synth_net")
        out = _chunked_tokens(
            synth, synth_in.reshape(B * N, HH * WW, -1),
            self.decode_chunks).reshape(B * N, HH, WW, 3)

        frames_out = jnp.clip(out.reshape(B, N, HH, WW, 3), 0.0, 1.0
                              ).transpose(1, 0, 2, 3, 4)
        # quirk preserved: the fork divides the raw (never x20) flow
        # (Ours_7.py:704)
        return frames_out, flow / 20.0 / (HH / H), flow_gt / 20.0 / (HH / H)
