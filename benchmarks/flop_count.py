"""Analytic FLOP count of the interp_256 U-Net forward (one denoiser call).

Walks the exact module plan of models/unet.py (mirroring reference
openaimodel.py:520-740's block layout): input conv, down/mid/up resblocks
with skip-concat input widths, Spatial Transformers at the configured
attention resolutions, up/downsamples, out head. MACs counted as 2 FLOPs.

Usage: python benchmarks/flop_count.py [H W]   (latent grid, default 32 24)
"""

import sys

H, W = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (32, 24)

MC = 224            # model_channels
IN_CH = 5           # 4 latent + 1 mask concat
OUT_CH = 4
MULT = (1, 2, 4, 4)
NRES = 2
ATTN_DS = (1, 2, 4)
CTX_T = 87
CTX_D = 768
T_EMB = 4 * MC


def conv(h, w, cin, cout, k=3):
    return 2 * h * w * k * k * cin * cout


def dense(rows, cin, cout):
    return 2 * rows * cin * cout


def resblock(h, w, cin, cout):
    f = conv(h, w, cin, cout) + conv(h, w, cout, cout)
    f += dense(1, T_EMB, cout)  # FiLM emb proj (per image)
    if cin != cout:
        f += conv(h, w, cin, cout, k=1)
    return f


def transformer(h, w, c, heads=8):
    t = h * w
    f = dense(t, c, c) * 2              # proj_in/out (1x1 equiv)
    f += dense(t, c, 3 * c)             # self qkv
    f += 2 * 2 * t * t * c              # scores + pv (all heads combined)
    f += dense(t, c, c)                 # self out
    f += dense(t, c, c) + dense(CTX_T, CTX_D, c) * 0  # cross q (k/v hoisted)
    f += 2 * 2 * t * CTX_T * c          # cross scores + pv
    f += dense(t, c, c)                 # cross out
    f += dense(t, c, 8 * c) + dense(t, 4 * c, c)  # GEGLU FF
    return f


def cross_kv(c):
    # hoisted once per sample (not per step): report separately
    return dense(CTX_T, CTX_D, c) * 2


total = 0
skips = []  # (h, w, ch) pushed by down path
h, w = H, W
ch = MC
total += conv(h, w, IN_CH, MC)
skips.append((h, w, MC))
ds = 1
per_level = {}
for i, m in enumerate(MULT):
    out = MC * m
    lvl = 0
    for _ in range(NRES):
        lvl += resblock(h, w, ch, out)
        ch = out
        if ds in ATTN_DS:
            lvl += transformer(h, w, ch)
        skips.append((h, w, ch))
    if i != len(MULT) - 1:
        lvl += conv(h // 2, w // 2, ch, ch)  # stride-2 downsample
        h, w, ds = h // 2, w // 2, ds * 2
        skips.append((h, w, ch))
    per_level[f"down_{i}(ds{ds if i == len(MULT)-1 else ds//2})"] = lvl
    total += lvl

mid = resblock(h, w, ch, ch) + transformer(h, w, ch) + resblock(h, w, ch, ch)
per_level["mid"] = mid
total += mid

for i in reversed(range(len(MULT))):
    out = MC * MULT[i]
    lvl = 0
    for j in range(NRES + 1):
        sh, sw, sc = skips.pop()
        lvl += resblock(h, w, ch + sc, out)
        ch = out
        if ds in ATTN_DS:
            lvl += transformer(h, w, ch)
        if i and j == NRES:
            lvl += conv(h * 2, w * 2, ch, ch)  # upsample conv
            h, w, ds = h * 2, w * 2, ds // 2
    per_level[f"up_{i}"] = lvl
    total += lvl

total += conv(h, w, ch, OUT_CH)  # out head (GN+SiLU negligible)

for k, v in per_level.items():
    print(f"{k:>16s}: {v/1e9:7.2f} GF")
print(f"U-Net forward: {total/1e9:.2f} GF/image/step at {H}x{W} latent")
hoist = sum(cross_kv(MC * m) for m, d in []) or None
print(f"(cross-attn K/V hoist, once per sample: "
      f"{sum(cross_kv(MC * m) for m in (1, 2, 4))/1e9:.3f} GF)")
