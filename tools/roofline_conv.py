"""Analytic roofline for the convolution category of the DESTR train step.

VERDICT r3 #3 asks for >=45% MFU at b8/640 or a recorded roofline argument.
This tool computes, per conv in the step (ResNet-50 @ 640px + reduce_dim +
mini-detector stacks, forward and backward), the FLOPs and the MINIMUM HBM
traffic (read input + weights, write output, bf16 activations / f32 filter
grads), and the resulting lower-bound execution time

    t_lb = max(flops / PEAK_FLOPS, bytes / PEAK_BW)

summed over the category. Comparing the sum to the measured conv-fusion
category time (tools/profile_step.py) separates "XLA is slow" from "the
arithmetic intensity of this architecture at this batch size bounds it".

The traffic model is generous to the hardware (it assumes every activation
is read exactly once, perfect fusion of BN/ReLU epilogues, no re-reads for
the 3x3 halo, weights resident): real execution cannot beat it.

Freezing: stem + layer1 never train (reference backbone.py:92-99; optimizer
labels them frozen and their grads feed optax.set_to_zero, so XLA DCEs the
whole sub-backward — confirmed in the r4 trace, which shows no 64-wide
filter-grad convs). Their convs therefore count forward-only.

Usage: python tools/roofline_conv.py [--batch 8] [--image 640]
"""

from __future__ import annotations

import argparse

PEAK_FLOPS = 197e12  # v5e bf16
PEAK_BW = 819e9  # v5e HBM bytes/s


def conv_cost(b, h, w, cin, cout, k, stride=1, train=True, act_bytes=2):
    """Returns a list of (tag, flops, bytes) for fwd (+bwd if train)."""
    ho, wo = h // stride, w // stride
    flops = 2 * b * ho * wo * cin * cout * k * k
    w_bytes = k * k * cin * cout * 4  # params live f32
    in_b = b * h * w * cin * act_bytes
    out_b = b * ho * wo * cout * act_bytes
    entries = [("fwd", flops, in_b + out_b + w_bytes)]
    if train:
        # dL/dW: reads input acts + output grads, writes f32 filter grad
        entries.append(("dW", flops, in_b + out_b + w_bytes * 2))
        # dL/dX: reads output grads + weights, writes input-shaped grad
        entries.append(("dX", flops, in_b + out_b + w_bytes))
    return entries


def bottleneck(b, hw, width, cin, stride, train, project, act_bytes=2):
    """torchvision bottleneck: 1x1 cin->w, 3x3 w->w (stride), 1x1 w->4w
    (+ projection 1x1 cin->4w at stride). Includes the residual add+ReLU
    traffic (read main + residual, write out; backward re-reads the grad) —
    it executes inside the conv fusions' epilogues, so it belongs to the
    measured conv-fusion category."""
    convs = [
        (b, hw, hw, cin, width, 1, 1),
        (b, hw, hw, width, width, 3, stride),
        (b, hw // stride, hw // stride, width, width * 4, 1, 1),
    ]
    if project:
        convs.append((b, hw, hw, cin, width * 4, 1, stride))
    out = []
    for c in convs:
        out.extend(conv_cost(*c, train=train))
    res_elems = b * (hw // stride) ** 2 * width * 4
    # fwd: the add's second operand (the residual) is an extra read the
    # conv-output write doesn't cover; ReLU fuses free
    out.append(("res_fwd", res_elems, res_elems * act_bytes))
    if train:
        # bwd: relu-mask select reads the saved activation + grad, writes
        # the fanned-out grad (one extra stream vs the dX write)
        out.append(("res_bwd", res_elems, 2 * res_elems * act_bytes))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--image", type=int, default=640)
    args = ap.parse_args()
    b, s = args.batch, args.image

    groups: dict[str, list] = {}

    # space-to-depth stem: 4x4 conv over (s/2, s/2, 12) -> 64 (frozen)
    groups["stem (frozen)"] = conv_cost(
        b, s // 2, s // 2, 12, 64, 4, 1, train=False
    )

    # layer1 @ s/4, width 64, in 64 (frozen: fwd only)
    hw = s // 4
    l1 = []
    l1 += bottleneck(b, hw, 64, 64, 1, False, True)
    for _ in range(2):
        l1 += bottleneck(b, hw, 64, 256, 1, False, False)
    groups["layer1 (frozen)"] = l1

    # layer2..4 train
    specs = [  # (blocks, width, cin, hw_in)
        (4, 128, 256, s // 4),
        (6, 256, 512, s // 8),
        (3, 512, 1024, s // 16),
    ]
    for i, (blocks, width, cin, hw_in) in enumerate(specs):
        g = []
        g += bottleneck(b, hw_in, width, cin, 2, True, True)
        for _ in range(blocks - 1):
            g += bottleneck(b, hw_in // 2, width, width * 4, 1, True, False)
        groups[f"layer{i + 2}"] = g

    c5 = s // 32
    groups["reduce_dim 1x1"] = conv_cost(b, c5, c5, 2048, 256, 1, 1, train=True)

    minidet = []
    for _ in range(3):  # cls/reg/pos stacks, 4x (3x3 256->256) each
        for _ in range(4):
            minidet.extend(conv_cost(b, c5, c5, 256, 256, 3, 1, train=True))
    groups["mini-detector"] = minidet

    print(f"{'group':<18}{'GFLOP':>9}{'GB':>8}{'t_flops ms':>11}"
          f"{'t_bw ms':>9}{'t_lb ms':>9}  bound")
    tot_f = tot_b = tot_lb = 0.0
    for name, entries in groups.items():
        f = sum(e[1] for e in entries)
        by = sum(e[2] for e in entries)
        tf, tb = f / PEAK_FLOPS, by / PEAK_BW
        lb = sum(max(e[1] / PEAK_FLOPS, e[2] / PEAK_BW) for e in entries)
        tot_f += f
        tot_b += by
        tot_lb += lb
        bound = "MXU" if tf > tb else "HBM"
        print(f"{name:<18}{f / 1e9:>9.1f}{by / 1e9:>8.2f}{tf * 1e3:>11.2f}"
              f"{tb * 1e3:>9.2f}{lb * 1e3:>9.2f}  {bound}")
    print(f"{'TOTAL':<18}{tot_f / 1e9:>9.1f}{tot_b / 1e9:>8.2f}"
          f"{tot_f / PEAK_FLOPS * 1e3:>11.2f}{tot_b / PEAK_BW * 1e3:>9.2f}"
          f"{tot_lb * 1e3:>9.2f}")
    print(
        "\nper-op lower bound (sum of max(flops, bytes) per conv): "
        f"{tot_lb * 1e3:.2f} ms — the conv category cannot run faster than "
        "this on v5e; measured category time comes from tools/profile_step.py"
    )


if __name__ == "__main__":
    main()
