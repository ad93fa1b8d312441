"""Model factory — the reference networks.define_G dispatch
(models/networks.py:17-61), mapping which_model_G strings to flax modules.

The Ours_* ablation forks of the reference (Ours_7/4/44/flow/flownorm/
ZSM/back — ~95% shared code, SURVEY.md §2.3) are expressed as MoTIF
configurations: they differ in flow-loss usage (Ours_ZSM trains without it,
handled by Trainer(flow_loss=False)), per-time-step evaluation chunking
(Ours_44 — Evaluator(chunk=1)) and the `setting` flag set.
"""

from __future__ import annotations

from motif_tpu.models.baselines import EDVR, SuperSloMo, TMNet, ZSM
from motif_tpu.models.motif import MoTIF
from motif_tpu.models.videoinr import VideoINR


def define_g(opt: dict):
    """opt: the 'network_G' section of a reference yml config."""
    which = opt.get("which_model_G") or "Ours"
    nf = int(opt.get("nf") or 64)
    groups = int(opt.get("groups") or 8)
    front = int(opt.get("front_RBs") or 5)
    back = int(opt.get("back_RBs") or 40)
    setting = int(opt.get("setting") or 5)

    if which == "Ours_flow":
        # the authors' flow/psies precomputer (Ours_flow.py:496-560)
        from motif_tpu.models.flow_precompute import FlowPrecompute

        return FlowPrecompute(scale=int(opt.get("scale") or 4))
    # mixed-precision compute (this framework's extension, not a reference
    # field): `compute_dtype: bfloat16` in network_G runs the conv trunk /
    # SIRENs in bf16 with fp32 flow+splat (models/motif.py compute_dtype).
    cdt = opt.get("compute_dtype") or None
    # serving-path toggles (framework extensions): fused_decode folds the
    # SIREN first layers through the LIIF upsample + splat (exact math);
    # splat_method picks the scatter backend ('scan' train / 'base' serve).
    fused = bool(opt.get("fused_decode") or False)
    spm = opt.get("splat_method") or "scan"
    rres = float(opt.get("raft_resolution") or 1.0)
    sdt = opt.get("splat_dtype") or None
    # decode_chunks: the reference's query-thirds LIIF memory bound
    # (Sakuya_arch.py:486-599) as a token-axis chunk count (exact math).
    dchunks = int(opt.get("decode_chunks") or 1)
    if which == "Ours_7":
        # first-two-anchor, linear-motion fork with hardcoded flags
        # (Ours_7.py:440-448) — equivalent to setting=3
        return MoTIF(setting=3, channel=nf, linear_motion=True,
                     compute_dtype=cdt)
    if which.startswith("Ours"):
        # Ours_44 / Ours_4 are the 4-anchor variants (Ours_44.py); the other
        # forks differ only in training wiring (see module docstring).
        n_anchors = 4 if which in ("Ours_44", "Ours_4") else 2
        return MoTIF(setting=setting, channel=nf, n_anchors=n_anchors,
                     compute_dtype=cdt, fused_decode=fused, splat_method=spm,
                     raft_resolution=rres, splat_dtype=sdt,
                     decode_chunks=dchunks)
    if which == "LIIF":
        return VideoINR(nf=nf, front_rbs=front, back_rbs=back, groups=groups)
    if which in ("ZSM", "Zooming"):
        return ZSM(nf=nf, front_rbs=front, back_rbs=back, groups=groups)
    if which == "TMNet":
        return TMNet(nf=nf, front_rbs=front, back_rbs=back, groups=groups)
    if which == "EDVR":
        return EDVR(nf=int(opt.get("nf") or 128),
                    num_frame=int(opt.get("nframes") or 7), groups=groups,
                    extract_blocks=front, recon_blocks=back,
                    with_tsa=bool(opt.get("with_tsa", True)))
    if which == "Super_SloMo":
        return SuperSloMo()
    raise NotImplementedError(f"Generator model [{which}] not recognized")


# chunking behaviour per model family at eval time
# (VideoSR_base_model.py:172-197)
EVAL_CHUNK = {"Ours_44": 1, "Ours": 3}
