"""Stage-by-stage on-device profile of the eGeMAPS chain.

Round-3 verdict item 1: 8.4 of every 9.6 ms of batched decode is eGeMAPS
functionals, with the chip at ~5% of bf16 peak. This script answers *where*
that time goes, on the real chip, using the tunnel-safe methodology from
bench.py (scan-amortized, value-fetch sync, RTT subtracted):

  python scripts/profile_egemaps.py            # stage breakdown at B=8
  python scripts/profile_egemaps.py --saturation  # B sweep w/ FLOP roofline

Every timed program reduces over ALL outputs it means to time (summing one
dict leaf lets XLA delete the rest — the round-2 dead-code trap).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import numpy as np                                      # noqa: E402

from koemorph_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


from koemorph_tpu.utils.profiling import (  # noqa: E402
    measure_rtt,
    scan_timed,
)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--saturation", action="store_true")
    p.add_argument("--micro", action="store_true")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seconds", type=float, default=17.05,
                   help="utterance length (512 frames at 30fps default)")
    args = p.parse_args()

    from koemorph_tpu.ops import egemaps as eg
    from koemorph_tpu.ops.f0 import yin_f0
    from koemorph_tpu.ops.stft import autocorr_matmul, power_spectrum_matmul
    from koemorph_tpu.ops.window import frame_signal, hann_window

    rtt = measure_rtt()
    print(f"# rtt_ms={rtt * 1e3:.2f}  device={jax.devices()[0].device_kind}",
          flush=True)

    cfg = eg.EgemapsConfig()
    b = args.batch
    length = int(args.seconds * cfg.sample_rate)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((b, length)).astype(np.float32)
                        * 0.1)

    results = {}

    def report(name, ms, flops):
        tf = flops / (ms / 1e3) / 1e12 if ms > 0 else 0.0
        results[name] = {"ms": round(ms, 4), "gflop": round(flops / 1e9, 2),
                         "tflops": round(tf, 2)}
        print(f"{name:34s} {ms:8.3f} ms   {flops / 1e9:8.2f} GF  "
              f"{tf:6.2f} TF/s", flush=True)

    if args.saturation:
        # saturation mode: skip the stage breakdown (compile budget)
        _saturation(args, cfg, rng, rtt, report, results)
        print(json.dumps(results))
        return

    # ---- full chain ----
    ms, fl = scan_timed(lambda a: eg.egemaps_concat_windows(a, cfg),
                        (audio,), rtt=rtt)
    report("egemaps_concat_windows (3 off)", ms, fl)

    ms, fl = scan_timed(lambda a: eg.compute_llds(a, cfg), (audio,), rtt=rtt)
    report("compute_llds", ms, fl)

    # functionals alone: fix the LLDs, perturb inside
    lld = jax.jit(lambda a: eg.compute_llds(a, cfg))(audio)
    lld = jax.tree_util.tree_map(jnp.asarray, lld)

    def functionals_only(f0s, lld_rest):
        l = dict(lld_rest)
        l["f0_semitone"] = f0s
        return eg.functionals_from_llds(l, cfg)

    lld_rest = {k: v for k, v in lld.items()}
    ms, fl = scan_timed(functionals_only, (lld["f0_semitone"], lld_rest),
                        rtt=rtt)
    report("functionals x1 (no mask)", ms, fl)

    def functionals_3(f0s, lld_rest):
        l = dict(lld_rest)
        l["f0_semitone"] = f0s
        t = l["voiced"].shape[-1]
        idx = jnp.arange(t)
        fp = cfg.hop_length / cfg.sample_rate
        outs = []
        for off in (0.0, 0.3, 0.6):
            cut = t - int(round(off / fp))
            mask = jnp.broadcast_to(idx < cut, l["voiced"].shape)
            outs.append(eg.functionals_from_llds(l, cfg, frame_mask=mask))
        return jnp.concatenate(outs, axis=-1)

    ms, fl = scan_timed(functionals_3, (lld["f0_semitone"], lld_rest),
                        rtt=rtt)
    report("functionals x3 (masked)", ms, fl)

    # ---- inside compute_llds ----
    ms, fl = scan_timed(
        lambda a: yin_f0(a, sample_rate=cfg.sample_rate, frame_length=512,
                         hop_length=cfg.hop_length, f0_min=cfg.f0_min,
                         f0_max=cfg.f0_max, center=False),
        (audio,), rtt=rtt)
    report("yin_f0", ms, fl)

    # frames for the sub-stage probes
    f0res = jax.jit(lambda a: yin_f0(
        a, sample_rate=cfg.sample_rate, frame_length=512,
        hop_length=cfg.hop_length, f0_min=cfg.f0_min, f0_max=cfg.f0_max,
        center=False))(audio)
    n_new = f0res.f0_hz.shape[-1]
    off = (512 - cfg.frame_length) // 2
    span = (n_new - 1) * cfg.hop_length + cfg.frame_length
    seg = jax.lax.slice_in_dim(audio, off, off + span, axis=-1)
    frames = jax.jit(lambda s: frame_signal(
        s, cfg.frame_length, cfg.hop_length, center=False))(seg)
    frames = jnp.asarray(frames)
    wframes = frames * hann_window(cfg.frame_length)
    print(f"# frames shape {frames.shape}", flush=True)

    ms, fl = scan_timed(
        lambda w: power_spectrum_matmul(w, cfg.n_fft), (wframes,), rtt=rtt)
    report("power_spectrum (512)", ms, fl)

    n_hnr_lags = int(np.ceil(cfg.sample_rate / (cfg.f0_min * 0.9))) + 2
    ms, fl = scan_timed(
        lambda f: autocorr_matmul(f, n_hnr_lags), (frames,), rtt=rtt)
    report(f"hnr autocorr ({n_hnr_lags} lags)", ms, fl)

    ms, fl = scan_timed(
        lambda w: autocorr_matmul(w, cfg.lpc_order + 1), (wframes,), rtt=rtt)
    report("lpc autocorr (11 lags)", ms, fl)

    def lpc_formants(w):
        r = autocorr_matmul(w, cfg.lpc_order + 1,
                            precision=cfg.precision)
        r = jnp.concatenate([r[..., :1] * (1.0 + 1e-4), r[..., 1:]],
                            axis=-1)
        a = eg._levinson(r, cfg.lpc_order)
        roots = eg._poly_roots_dk(a)
        return jnp.angle(roots), jnp.abs(roots)

    ms, fl = scan_timed(lpc_formants, (wframes,), rtt=rtt)
    report("lpc+levinson+dk_roots", ms, fl)

    # full LLD math given precomputed frames+f0 (spectral chain minus YIN)
    def lld_math_only(fr, wfr):
        out, _ = eg._lld_math(fr, wfr, f0res.f0_hz, f0res.voiced_flag, cfg,
                              carry=None)
        return out

    ms, fl = scan_timed(lld_math_only, (frames, wframes), rtt=rtt)
    report("lld_math (spectral chain)", ms, fl)

    if args.micro:
        from koemorph_tpu.ops.f0 import (
            _yin_difference_and_acf, cmndf, yin_frame_difference)

        prec = cfg.precision
        yframes = jax.jit(lambda a: frame_signal(
            a, 512, cfg.hop_length, center=False))(audio)
        yframes = jnp.asarray(yframes)

        ms, fl = scan_timed(
            lambda a: frame_signal(a, 512, cfg.hop_length, center=False),
            (audio,), rtt=rtt)
        report("frame_signal(512)", ms, fl)

        tau_max = int(np.ceil(cfg.sample_rate / cfg.f0_min))
        n_acf = int(np.ceil(cfg.sample_rate / (cfg.f0_min * 0.9))) + 2

        ms, fl = scan_timed(
            lambda f: _yin_difference_and_acf(f, tau_max, n_acf, prec),
            (yframes,), rtt=rtt)
        report("yin diff+acf", ms, fl)

        ms, fl = scan_timed(
            lambda f: cmndf(yin_frame_difference(f, tau_max, prec),
                            precision=prec),
            (yframes,), rtt=rtt)
        report("yin diff+cmndf", ms, fl)

        ms, fl = scan_timed(
            lambda f: autocorr_matmul(f, n_acf, precision=prec),
            (yframes,), rtt=rtt)
        report("yin shared acf only", ms, fl)

        ms, fl = scan_timed(
            lambda f: autocorr_matmul(f[..., 512 - tau_max:], tau_max + 1,
                                      precision=prec),
            (yframes,), rtt=rtt)
        report("yin tail acf only", ms, fl)

        def rtau(f, cumsum_fn):
            sq = f * f
            w = 512 - tau_max
            r0 = jnp.sum(sq[..., :w], axis=-1, keepdims=True)
            diff = sq[..., w:] - sq[..., :tau_max]
            return r0 + jnp.concatenate(
                [jnp.zeros_like(r0), cumsum_fn(diff)], axis=-1)

        from koemorph_tpu.ops.f0 import _cumsum_matmul

        ms, fl = scan_timed(
            lambda f: rtau(f, lambda d: _cumsum_matmul(d, prec)),
            (yframes,), rtt=rtt)
        report("yin r_tau (matmul cumsum)", ms, fl)

        ms, fl = scan_timed(
            lambda f: rtau(f, lambda d: jnp.cumsum(d, axis=-1)),
            (yframes,), rtt=rtt)
        report("yin r_tau (native, old)", ms, fl)

        def pick_stage(f):
            d, _, _, _ = _yin_difference_and_acf(f, tau_max, tau_max + 1,
                                                 prec)
            dprime = cmndf(d, precision=prec)
            region = dprime[..., 32:]
            nxt = jnp.concatenate(
                [region[..., 1:], jnp.full_like(region[..., :1], jnp.inf)],
                axis=-1)
            candidate = (region < 0.15) & (region <= nxt)
            idx = jnp.argmax(candidate, axis=-1)
            idx_min = jnp.argmin(region, axis=-1)
            return idx + idx_min

        ms, fl = scan_timed(pick_stage, (yframes,), rtt=rtt)
        report("yin diff+cmndf+pick", ms, fl)

    print(json.dumps(results))


def _saturation(args, cfg, rng, rtt, report, results) -> None:
    from koemorph_tpu.models.dual_stream_model import (
        SequentialDualStreamModel)

    model = SequentialDualStreamModel(
        d_model=256, num_heads=8, mel_sequence_length=256,
        emotion_backend="egemaps", use_concatenation=True,
        target_fps=30, dropout=0.0, stride_frames=4)
    hop30 = 533
    seq_len = 512 * hop30
    n_out = (512 - 256) // 4 + 1
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, seq_len), jnp.float32))["params"]
    jax.block_until_ready(params)

    print("# batch saturation (sequential decode, 17s utts, stride 4)",
          flush=True)
    for bb in (8, 16, 32, 64, 128):
        audio_b = jnp.asarray(
            rng.standard_normal((bb, seq_len)).astype(np.float32) * 0.1)

        def dec(a):
            return model.apply({"params": params}, a,
                               deterministic=True)["blendshapes"]

        iters = max(2, 16 // (bb // 8))
        ms, fl = scan_timed(dec, (audio_b,), rtt=rtt, iters=iters)
        fps_chip = bb * n_out / (ms / 1e3)
        report(f"decode B={bb}", ms, fl)
        results[f"decode B={bb}"]["frames_per_s_chip"] = round(fps_chip)
        print(f"    -> {fps_chip:,.0f} frames/s/chip", flush=True)


if __name__ == "__main__":
    main()
