"""Per-kernel microbenchmarks with empirically-probed rooflines.

Probes (stream copy -> HBM GB/s; big bf16/f32 matmul -> TFLOP/s) establish
what THIS chip can do; each kernel row then reports achieved samples/s,
effective GB/s over its minimal HBM traffic, and the fraction of the
measured memory roofline that represents.  "Speed-of-light" for the
memory-bound DSP kernels here = the stream-copy bandwidth.

Traffic accounting: `bytes` counts the minimal algorithmic HBM traffic
(inputs read once + outputs written once).  A kernel at fraction ~1.0 is
making one fused pass; fractions far below 1.0 indicate extra materialized
intermediates or serialized passes (e.g. cumsum's log-shift lowering) --
the signal to reach for Pallas (SURVEY.md §7 M5).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from bench.util import Report, bench
from tpu_ofdm.config import OfdmConfig
from tpu_ofdm.kernels import fft as kfft
from tpu_ofdm.ops import sync as ksync
from tpu_ofdm.spectrum import channelizer as kchan
from tpu_ofdm.spectrum import psd as kpsd

C64 = 8      # bytes per complex64 (travels as 2x f32 on the wire)
F32 = 4


def _noise(shape, seed=0, dtype=np.complex64):
    rng = np.random.RandomState(seed)
    if np.issubdtype(dtype, np.complexfloating):
        x = rng.randn(*shape) + 1j * rng.randn(*shape)
        return x.astype(dtype)
    return rng.randn(*shape).astype(dtype)


def probe_membw(report: Report, mb: int = 256) -> float:
    """Stream copy: y = x + 1 over `mb` MB of f32.  Returns GB/s."""
    n = mb * (1 << 20) // F32
    x = np.arange(n, dtype=np.float32) * 1e-6
    sec = bench(lambda a: a + 1.0, (x,))
    gbps = 2 * n * F32 / sec / 1e9  # read + write; scalar re-read ~free (fused)
    report.add(kernel="probe_stream_copy", mb=mb, sec=sec, gbps=gbps)
    return gbps


def probe_matmul(report: Report, n: int = 4096) -> float:
    """bf16 n^3 matmul.  Returns TFLOP/s."""
    a = _noise((n, n), 1, np.float32).astype(jnp.bfloat16)
    b = _noise((n, n), 2, np.float32).astype(jnp.bfloat16)
    sec = bench(
        lambda p, q: jnp.dot(p, q, preferred_element_type=jnp.float32),
        (a, b),
    )
    tflops = 2 * n**3 / sec / 1e12
    report.add(kernel="probe_matmul_bf16", n=n, sec=sec, tflops=tflops)
    return tflops


def bench_fft(report: Report, membw: float, mm_tflops: float):
    """Batched matmul-DFT at OFDM/PSD-relevant sizes.

    Protocol (r5): a SELF-CHAINED fori_loop of y = ifft(fft(y)) -- data
    dependence serializes iterations with ZERO harness passes (the loop
    carry IS the transform output), so frac_membw is exact, unlike the
    generic bench() whose perturb/reduce machinery adds up to ~1.5 passes
    of ambiguity on memory-bound rows.  Each iteration times TWO
    transforms; sec is per transform.

    Roofline note (measured 2026-08-21, five formulations): fft64 ~0.90 and
    fft256 ~0.67 of stream-copy are at/near saturation; fft1024/fft4096
    ~0.43 is STRUCTURAL for natural-order four-step on this chip -- the
    balanced and 128-biased splits and transpose-free dot_general forms all
    measured 0.37-0.44, and a fused Pallas four-step must either pay a
    Z-order->natural reorder pass (bound ~0.50) or fold the reorder into
    the final matmul at n1 x the MXU flops (bound ~0.37).  The 1024-bin
    SPECTRUM path does not ride this: it uses the fused PSD kernel."""
    import time

    import jax.numpy as jnp

    from tpu_ofdm.utils.device_io import maybe_encode, tpu_safe

    for batch, n in [(1 << 17, 64), (1 << 15, 256), (1 << 13, 1024),
                     (1 << 11, 4096)]:
        x = _noise((batch, n), seed=n)
        reps, n_iter, trials = 24, 4, 3

        def repeated(a, _n=n):
            def body(i, c):
                return kfft.ifft(kfft.fft(c))
            y = jax.lax.fori_loop(0, reps, body, a)
            return jnp.sum(jnp.real(y[:1, :8]))

        jfn = jax.jit(tpu_safe(repeated))
        d = jax.device_put(maybe_encode(x))
        jax.device_get(jfn(d))
        sec = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            jax.device_get([jfn(d) for _ in range(n_iter)])
            sec = min(sec, (time.perf_counter() - t0) / (n_iter * reps * 2))
        samples = batch * n
        # complex matmul = 4 real matmuls (+ four-step stages for n>256)
        stages = 1 if n <= 256 else 2
        flops = 8.0 * samples * (np.sqrt(n) if stages == 2 else n) * stages
        bytes_ = samples * C64 * 2  # in + out
        report.add(
            kernel=f"fft{n}", batch=batch, sec=sec,
            msamp_s=samples / sec / 1e6,
            gbps=bytes_ / sec / 1e9,
            frac_membw=bytes_ / sec / 1e9 / membw,
            tflops=flops / sec / 1e12,
            frac_mxu=flops / sec / 1e12 / mm_tflops,
            protocol="self-chained ifft(fft(.)), exact accounting",
        )


def bench_sync(report: Report, membw: float):
    """Schmidl-Cox stages over a steady-state block (n = 2^22: at the old
    2^20 the ~0.3 ms per-program floor dominated -- VERDICT r3 weak #2)."""
    spec = OfdmConfig(fft_len=64, cp_len=16, modulation="qpsk").spec
    n = 1 << 22
    x = _noise((n,), 3)

    # THE production detect stage: fused single-pass Pallas row summaries
    # (what rx_stream/detect_frames actually run on TPU)
    from tpu_ofdm.kernels.sc_detect import sc_detect_rows

    L = spec.fft_len // 2
    sec = bench(lambda a: sc_detect_rows(a, L, spec.cp_len), (x,))
    bytes_ = n * 8  # kernel design: 8 B/sample (two f32 planes in, rows ~0)
    report.add(
        kernel="sc_detect_rows", n=n, sec=sec, msamp_s=n / sec / 1e6,
        gbps=bytes_ / sec / 1e9, frac_membw=bytes_ / sec / 1e9 / membw,
    )

    sec = bench(lambda a: ksync.schmidl_cox(spec, a), (x,))
    # minimal traffic: read x (c64), write M/P/R (f32 + c64 + f32)
    bytes_ = n * (C64 + F32 + C64 + F32)
    report.add(
        kernel="schmidl_cox_metric", n=n, sec=sec,
        msamp_s=n / sec / 1e6, gbps=bytes_ / sec / 1e9,
        frac_membw=bytes_ / sec / 1e9 / membw,
        note="diagnostic API path (materializes full M/P/R streams + local "
             "energy gate); production detection rides sc_detect_rows",
    )

    sec = bench(lambda a: ksync.detect_frames(spec, a, 8), (x,))
    report.add(
        kernel="detect_frames", n=n, sec=sec, msamp_s=n / sec / 1e6,
    )

    # DEMOTED: standalone moving_sum no longer sits on any shipped hot path
    # -- every production sliding window is fused into its consumer kernel
    # (sc_detect banded windows, sc_metric, psd) -- so its cumsum+lead-lag
    # formulation (one extra materialized pass, ~25% membw at the 8B/sample
    # accounting) is retained only as the CPU-fallback/utility form
    # (ops.sync fallbacks, stream.block moving_average).
    sec = bench(lambda a: ksync.moving_sum(a, 32), (np.abs(_noise((n, ), 4)).astype(np.float32),))
    bytes_ = n * (F32 * 2)
    report.add(
        kernel="moving_sum_w32_fallback_util", n=n, sec=sec,
        msamp_s=n / sec / 1e6,
        gbps=bytes_ / sec / 1e9, frac_membw=bytes_ / sec / 1e9 / membw,
        note="superseded on hot paths by fused windows in sc_detect/"
             "sc_metric/psd; utility+fallback only",
    )


def bench_channelizer(report: Report, membw: float):
    """THE production path: channelize_stream with its tail carry (fused
    Pallas on TPU), at 64/256/512 channels (512 = BASELINE config 5), plus
    one demoted unfused-XLA row for comparison (VERDICT r3 missing #2: the
    old rows benched zero-history kchan.channelize, which the streaming
    pipeline does not run)."""
    n = 1 << 23
    for n_chan in (64, 256, 512):
        x = _noise((n,), 5)
        taps = kchan.lowpass_taps(n_chan)
        poly = kchan.polyphase_decompose(taps, n_chan)
        tail = np.zeros(kchan.stream_tail_len(n_chan, taps), np.complex64)
        sec = bench(
            lambda a, t, nc=n_chan, tp=taps, pp=poly:
                kchan.channelize_stream(a, t, nc, tp, pp),
            (x, tail),
        )
        bytes_ = n * C64 * 2  # in + out; tail carry ~free
        report.add(
            kernel=f"channelize_stream{n_chan}", n=n, sec=sec,
            msamp_s=n / sec / 1e6, gbps=bytes_ / sec / 1e9,
            frac_membw=bytes_ / sec / 1e9 / membw,
        )

    x = _noise((n,), 5)
    taps = kchan.lowpass_taps(64)
    sec = bench(lambda a: kchan.channelize(a, 64, taps), (x,))
    bytes_ = n * C64 * 2
    report.add(
        kernel="pfb_channelizer64_unfused_xla", n=n, sec=sec,
        msamp_s=n / sec / 1e6, gbps=bytes_ / sec / 1e9,
        frac_membw=bytes_ / sec / 1e9 / membw,
    )


def bench_psd(report: Report, membw: float):
    """psd_frames as shipped (fused Pallas kernel on TPU for these sizes)
    plus the demoted unfused-XLA chain for comparison."""
    n = 1 << 22
    for fft_len in (256, 1024):
        x = _noise((n,), 6)
        sec = bench(lambda a, fl=fft_len: kpsd.psd_frames(a, fl), (x,))
        bytes_ = n * (C64 + F32)
        report.add(
            kernel=f"psd_frames{fft_len}", n=n, sec=sec,
            msamp_s=n / sec / 1e6,
            gbps=bytes_ / sec / 1e9, frac_membw=bytes_ / sec / 1e9 / membw,
        )

    fft_len = 1024
    x = _noise((n,), 6)
    # 2-D input skips the fused path -> the old five-op XLA chain
    sec = bench(
        lambda a: kpsd.psd_frames(a.reshape(1, -1), fft_len)[0], (x,)
    )
    bytes_ = n * (C64 + F32)
    report.add(
        kernel=f"psd_frames{fft_len}_unfused_xla", n=n, sec=sec,
        msamp_s=n / sec / 1e6,
        gbps=bytes_ / sec / 1e9, frac_membw=bytes_ / sec / 1e9 / membw,
    )


def main():
    report = Report("kernels")
    print(f"# backend={jax.default_backend()} device={jax.devices()[0]}")
    membw = probe_membw(report)
    mm = probe_matmul(report)
    bench_fft(report, membw, mm)
    bench_sync(report, membw)
    bench_channelizer(report, membw)
    bench_psd(report, membw)
    report.save()


if __name__ == "__main__":
    main()
