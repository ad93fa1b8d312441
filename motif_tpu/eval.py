"""Evaluation harness — the reference test.py protocol (test.py:155-295):
zero-pad LQ to /4 multiples, forward in temporal chunks of 3 times
(VideoSR_base_model.py:188-193), crop to GT size, Y-channel PSNR
(anchor/inter/center split) + MATLAB SSIM, per-clip .npy dumps."""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from motif_tpu.utils import metrics


@dataclass
class EvalResults:
    psnr: list = field(default_factory=list)
    psnr_anchor: list = field(default_factory=list)
    psnr_inter: list = field(default_factory=list)
    psnr_center: list = field(default_factory=list)
    ssim: list = field(default_factory=list)
    psnrs_all: list = field(default_factory=list)
    ssim_all: list = field(default_factory=list)
    l1: list = field(default_factory=list)
    flows: list = field(default_factory=list)    # mean |flow - flow_GT| (test.py:240)
    flows_0: list = field(default_factory=list)  # mean |flow| (test.py:241)

    def summary(self) -> dict:
        out = {
            "psnr": float(np.mean(self.psnr)),
            "psnr_anchor": float(np.mean(self.psnr_anchor)),
            "psnr_inter": float(np.mean(self.psnr_inter)),
            "psnr_center": float(np.mean(self.psnr_center)),
            "ssim": float(np.mean(self.ssim)),
            "l1": float(np.mean(self.l1)),
            "n_clips": len(self.psnr),
        }
        if self.flows:  # only families that return flows (reference try/except)
            out["flow_err"] = float(np.mean(self.flows))
            out["flow_abs"] = float(np.mean(self.flows_0))
        return out


class Evaluator:
    """Jit-cached evaluator with the reference's per-family test dispatch
    (VideoSR_base_model.py:169-200):

      * Ours family — times chunked (3 for Ours, 1 for Ours_44 — the
        reference calls Ours_44 once per time, :182-187), iter=4;
      * LIIF (VideoINR) — per-time list output stacked (:178-179);
      * EDVR — single center output repeated over the N target times (:172-175);
      * Super_SloMo — called as (x, factor=len(times)-1) (:180-181), the
        UNets sized to the eval resolution;
      * TMNet — interior times only (:196-197);
      * ZSM — fixed (B, 2N-1) output, no times argument (:176-177).

    Caches one compiled forward per (lq_shape, n_times_chunk, out_hw)
    bucket — the TPU analogue of the reference's implicit cudnn autotune.
    """

    def __init__(self, model, params, scale: int = 4, iters: int = 4,
                 chunk: int = 3, family: str = "Ours"):
        self.model = model
        self.params = params
        self.scale = scale
        self.iters = iters
        if family in ("Ours_44", "Ours_4"):
            self.family = family
            chunk = 1    # per-time-step forward (VideoSR_base_model.py:182-187)
        elif family.startswith("Ours"):
            self.family = "Ours"
        else:
            self.family = family
        self.chunk = chunk
        self._fns: dict[Any, Any] = {}

    def _forward(self, lq_shape, n_times, out_hw):
        key = (lq_shape, n_times, out_hw)
        if key not in self._fns:
            model, iters, family = self.model, self.iters, self.family

            if family.startswith("Ours"):
                # also surface the flow metrics the reference logs
                # (test.py:239-242): mean |flow - flow_GT| and mean |flow|,
                # reduced on-device to scalars.
                def fwd(params, lq, times):
                    frames, flow, flow_gt = model.apply(
                        {"params": params}, lq, times,
                        out_hw, use_gt=False, iters=iters)
                    return frames, (jnp.abs(flow - flow_gt).mean(),
                                    jnp.abs(flow).mean())
            elif family == "LIIF":
                def fwd(params, lq, times):
                    preds = model.apply({"params": params}, lq, times, out_hw)
                    return jnp.stack(preds, 0)          # list → (N, B, HH, WW, 3)
            elif family == "EDVR":
                def fwd(params, lq, times):
                    out = model.apply({"params": params}, lq)  # (B, HH, WW, 3)
                    return jnp.repeat(out[None], n_times, 0)
            elif family == "Super_SloMo":
                sized = self.model.clone(h0=out_hw[0], w0=out_hw[1])

                def fwd(params, lq, times):
                    out = sized.apply({"params": params},
                                      lq[:, [0, -1]], n_times - 1)
                    return out.transpose(1, 0, 2, 3, 4)  # (B,N,...) → (N,B,...)
            elif family == "TMNet":
                def fwd(params, lq, times):
                    out = model.apply({"params": params}, lq, times[:, 1:-1])
                    return out.transpose(1, 0, 2, 3, 4)
            elif family in ("ZSM", "Zooming"):
                def fwd(params, lq, times):
                    out = model.apply({"params": params}, lq)
                    return out.transpose(1, 0, 2, 3, 4)
            else:
                raise NotImplementedError(f"eval family [{family}]")

            self._fns[key] = jax.jit(fwd)
        return self._fns[key]

    @property
    def _chunked(self) -> bool:
        """Only the Ours family chunks over times; the other families consume
        all target times in one call (VideoSR_base_model.py:172-181,196)."""
        return self.family.startswith("Ours")

    def infer(self, lq: np.ndarray, times: np.ndarray, out_hw) -> np.ndarray:
        """lq (B, N_in, H, W, 3); times (B, N). Pads LQ to /4, chunks times
        by `chunk` (padding the last chunk by repetition, then cropping),
        returns (N, B, H_out, W_out, 3) cropped to out_hw."""
        B, N_in, h, w, _ = lq.shape
        s = self.scale
        h_n = int(np.ceil(h / 4) * 4)   # test.py:171-174 zero-pad to /4
        w_n = int(np.ceil(w / 4) * 4)
        lq_p = np.zeros((B, N_in, h_n, w_n, 3), np.float32)
        lq_p[:, :, :h, :w] = lq
        HH, WW = h_n * s, w_n * s

        n = times.shape[1]
        outs, fstats = [], []
        step = self.chunk if self._chunked else n
        for start in range(0, n, step):
            t = times[:, start:start + step]
            pad = step - t.shape[1] if n > step else 0
            if pad:
                t = np.concatenate([t, np.repeat(t[:, -1:], pad, 1)], 1)
            fwd = self._forward(lq_p.shape, t.shape[1], (HH, WW))
            out = fwd(self.params, jnp.asarray(lq_p), jnp.asarray(t))
            if isinstance(out, tuple):  # Ours family: (frames, flow scalars)
                frames, fs = out
                fstats.append((float(fs[0]), float(fs[1])))
            else:
                frames = out
            frames = np.asarray(frames)
            if pad:
                frames = frames[: t.shape[1] - pad]
            outs.append(frames)
        out = np.concatenate(outs, 0)
        flow_stats = tuple(np.mean(fstats, 0)) if fstats else None
        return out[:, :, : out_hw[0], : out_hw[1]], flow_stats

    def run(self, loader, save_psnr_dir: str | None = None,
            log_every: int = 1, logger=None, name: str = "") -> EvalResults:
        res = EvalResults()
        for it, batch in enumerate(loader):
            lq, gt, times = batch["lq"], batch["gt"], batch["times"]
            B = lq.shape[0]
            H, W = gt.shape[2], gt.shape[3]
            fake, flow_stats = self.infer(lq, times, (H, W))  # (N, B, H, W, 3)
            if flow_stats is not None:
                res.flows.append(flow_stats[0])
                res.flows_0.append(flow_stats[1])
            real = gt[:, 1:-1]                            # (B, N, H, W, 3)
            n = real.shape[1]
            fake_bn = fake.transpose(1, 0, 2, 3, 4).reshape(B * n, H, W, 3)
            real_bn = real.reshape(B * n, H, W, 3)

            res.l1.append(float(np.abs(real_bn - fake_bn).mean()))
            ry = metrics.rgb_to_y(real_bn)
            fy = metrics.rgb_to_y(fake_bn)
            p_a, p_i, p_c, p, per = metrics.eval_psnr_split(ry, fy)
            res.psnr_anchor.append(p_a)
            res.psnr_inter.append(p_i)
            res.psnr_center.append(p_c)
            res.psnr.append(p)
            res.psnrs_all.append(per)
            ssims = [metrics.calculate_ssim(ry[i] * 255.0, fy[i] * 255.0)
                     for i in range(B * n)]
            res.ssim.append(float(np.mean(ssims[:-1])))
            res.ssim_all.append(ssims)
            if logger and (it % log_every == 0):
                s = res.summary()
                logger.info(
                    f"[{it}] psnr {p:.3f} (avg {s['psnr']:.3f}) "
                    f"center {p_c:.3f} (avg {s['psnr_center']:.3f}) "
                    f"ssim avg {s['ssim']:.4f}")
        if save_psnr_dir:
            # file named by experiment like the reference
            # ('./psnrs/' + opt['name'] + '.npy', test.py:290-291)
            os.makedirs(save_psnr_dir, exist_ok=True)
            stem = name or "psnrs"
            np.save(os.path.join(save_psnr_dir, f"{stem}.npy"),
                    np.asarray(res.psnrs_all, dtype=object), allow_pickle=True)
            np.save(os.path.join(save_psnr_dir, f"{stem}_ssim.npy"),
                    np.asarray(res.ssim_all, dtype=object), allow_pickle=True)
        return res
