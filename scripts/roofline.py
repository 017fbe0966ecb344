"""Analytic roofline for the flagship train step (RetinaNet-R50 640px bs16).

Enumerates every conv in backbone/FPN/heads, computes train FLOPs
(fwd + input-grad + weight-grad ≈ 3× fwd) and minimum HBM traffic
(bf16 activations, each major tensor touched once per pass), and combines
them with the MEASURED per-region times from scripts/profile_regions.py
(recorded in ROADMAP.md round-2 campaign) into per-region MFU / roofline
utilization. This is the quantitative backing for docs/ROOFLINE.md — run it
to regenerate the table.

v5e chip peaks used: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
"""

from __future__ import annotations

import json

B = 16
H = W = 640
PEAK_FLOPS = 197e12
PEAK_BW = 819e9
BYTES = 2  # bf16 activations

# measured ms per region, R50-640 bs16 train step (prefix-differencing,
# scripts/profile_regions.py on TPU v5e-1, 2026-08-16; total step 94.3 ms)
MEASURED_MS = {
    "stem": 10.1,
    "layer1": 17.6,
    "layer2": 10.4,
    "layer3": 8.4,
    "layer4": 3.7,
    "fpn+heads": 29.8,
    "loss": 5.0,  # standalone fwd+bwd (see ROADMAP: differencing artifact)
    # direct: production step 95.5 − model+loss 92.3 (profile_optimizer.py)
    "optimizer+misc": 3.2,
    # isolated-jit prefixes lose cross-region fusion; their Δs undercount
    # by this much vs the real full-step time (see docs/ROOFLINE.md note)
    "fusion-boundary": 6.1,
}


def conv(h, w, cin, cout, k, stride=1):
    """Returns (fwd_flops, min_traffic_bytes) for one conv at batch B."""
    oh, ow = h // stride, w // stride
    flops = 2 * B * oh * ow * cin * cout * k * k
    # fwd: read x + write y; bwd adds: read dy, write dx (dgrad) and
    # re-read x, dy for wgrad (XLA keeps dy in HBM between the two) —
    # count each big tensor once per pass it participates in.
    x_b = B * h * w * cin * BYTES
    y_b = B * oh * ow * cout * BYTES
    fwd_t = x_b + y_b
    bwd_t = 2 * y_b + x_b + x_b  # read dy (×2 passes), write dx, read x
    return flops, fwd_t, bwd_t


def bottleneck_stage(h, w, cin, f, n_blocks, stride):
    """R50 stage: n_blocks bottlenecks, first has stride + projection."""
    total = [0, 0, 0]
    for b in range(n_blocks):
        s = stride if b == 0 else 1
        cin_b = cin if b == 0 else f * 4
        for fl, ft, bt in (conv(h, w, cin_b, f, 1),
                           conv(h, w, f, f, 3, s),
                           conv(h // s, w // s, f, f * 4, 1)):
            total[0] += fl
            total[1] += ft
            total[2] += bt
        if b == 0:
            fl, ft, bt = conv(h, w, cin_b, f * 4, 1, s)
            total[0] += fl
            total[1] += ft
            total[2] += bt
        h, w = h // s, w // s
    return total, h, w


def main():
    regions = {}

    # stem: 7x7 s2 conv + maxpool (pool fwd+bwd is pure bandwidth)
    fl, ft, bt = conv(H, W, 3, 64, 7, 2)
    pool_t = (B * 320 * 320 * 64 + B * 160 * 160 * 64) * BYTES
    regions["stem"] = [3 * fl, ft + bt + 2 * pool_t]

    h, w, cin = 160, 160, 64
    for name, f, n, s in (("layer1", 64, 3, 1), ("layer2", 128, 4, 2),
                          ("layer3", 256, 6, 2), ("layer4", 512, 3, 2)):
        (flops, fwd_t, bwd_t), h, w = bottleneck_stage(h, w, cin, f, n, s)
        regions[name] = [3 * flops, fwd_t + bwd_t]
        cin = f * 4

    # FPN: laterals (1x1 on C3/C4/C5) + 3 output 3x3 + P6/P7 strided
    fpn = [0, 0]
    for (hh, ww, c) in ((80, 80, 512), (40, 40, 1024), (20, 20, 2048)):
        fl, ft, bt = conv(hh, ww, c, 256, 1)
        fpn[0] += 3 * fl
        fpn[1] += ft + bt
    for (hh, ww) in ((80, 80), (40, 40), (20, 20)):
        fl, ft, bt = conv(hh, ww, 256, 256, 3)
        fpn[0] += 3 * fl
        fpn[1] += ft + bt
    fl, ft, bt = conv(20, 20, 2048, 256, 3, 2)  # P6
    fpn[0] += 3 * fl
    fpn[1] += ft + bt
    fl, ft, bt = conv(10, 10, 256, 256, 3, 2)  # P7
    fpn[0] += 3 * fl
    fpn[1] += ft + bt

    # heads: shared cls/box towers (4×3x3x256x256 + final) on P3..P7
    heads = [0, 0]
    A, K = 9, 80
    for (hh, ww) in ((80, 80), (40, 40), (20, 20), (10, 10), (5, 5)):
        for _ in range(2):  # cls + box towers
            for _ in range(4):
                fl, ft, bt = conv(hh, ww, 256, 256, 3)
                heads[0] += 3 * fl
                heads[1] += ft + bt
        fl, ft, bt = conv(hh, ww, 256, A * K, 3)  # cls out
        heads[0] += 3 * fl
        heads[1] += ft + bt
        fl, ft, bt = conv(hh, ww, 256, A * 4, 3)  # box out
        heads[0] += 3 * fl
        heads[1] += ft + bt
    regions["fpn+heads"] = [fpn[0] + heads[0], fpn[1] + heads[1]]

    # loss: matching [B,A,maxGT] IoU + focal/smooth-L1 on [B,A,K]
    n_anchors = sum(hh * ww * 9 for hh, ww in
                    ((80, 80), (40, 40), (20, 20), (10, 10), (5, 5)))
    loss_t = 4 * B * n_anchors * K * BYTES  # logits fwd+bwd r/w dominate
    regions["loss"] = [B * n_anchors * 100 * 30, loss_t]

    # optimizer: adam on 38M fp32 params: read p,m,v,g write p,m,v
    regions["optimizer+misc"] = [38e6 * 20, 38e6 * 4 * 7]
    regions["fusion-boundary"] = [0, 0]

    rows = []
    tot_fl = tot_ms = tot_ideal = 0.0
    for name, (flops, traffic) in regions.items():
        ms = MEASURED_MS[name]
        t_compute = flops / PEAK_FLOPS * 1e3
        t_mem = traffic / PEAK_BW * 1e3
        ideal = max(t_compute, t_mem)
        rows.append((name, flops / 1e12, traffic / 1e9, ms,
                     t_compute, t_mem, ideal,
                     100 * flops / (ms / 1e3) / PEAK_FLOPS,
                     100 * ideal / ms))
        tot_fl += flops
        tot_ms += ms
        tot_ideal += ideal

    hdr = (f"{'region':<15}{'TFLOP':>7}{'GB':>7}{'meas ms':>9}"
           f"{'t_mxu':>7}{'t_hbm':>7}{'ideal':>7}{'MFU%':>6}{'roofl%':>7}")
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        print(f"{r[0]:<15}{r[1]:>7.2f}{r[2]:>7.1f}{r[3]:>9.1f}"
              f"{r[4]:>7.1f}{r[5]:>7.1f}{r[6]:>7.1f}{r[7]:>6.1f}{r[8]:>7.0f}")
    print("-" * len(hdr))
    print(f"{'TOTAL':<15}{tot_fl / 1e12:>7.2f}{'':>7}{tot_ms:>9.1f}"
          f"{'':>7}{'':>7}{tot_ideal:>7.1f}"
          f"{100 * tot_fl / (tot_ms / 1e3) / PEAK_FLOPS:>6.1f}"
          f"{100 * tot_ideal / tot_ms:>7.0f}")
    print()
    print(json.dumps({
        "step_ms_measured": tot_ms,
        "step_ms_roofline": round(tot_ideal, 1),
        "img_per_s_measured": round(B / tot_ms * 1e3, 1),
        "img_per_s_roofline": round(B / tot_ideal * 1e3, 1),
        "mfu_pct": round(100 * tot_fl / (tot_ms / 1e3) / PEAK_FLOPS, 1),
    }))


if __name__ == "__main__":
    main()
