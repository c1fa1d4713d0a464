"""Analytic FLOP counts for every released variant: U-Net forward (one
denoiser call) + first-stage decode, and the per-chip speed-of-light table.

Walks the exact module plans of models/unet.py and models/vae.py (mirroring
reference openaimodel.py:520-740 and model.py:462-568 block layouts): input
conv, down/mid/up resblocks with skip-concat input widths, Spatial
Transformers at the configured attention resolutions, up/downsamples, out
head; decoder conv_in, mid res+attn+res, (nres+1)-deep up levels, conv_out.
MACs counted as 2 FLOPs.

Usage:
    python benchmarks/flop_count.py                      # all variants
    python benchmarks/flop_count.py interp_256 [steps]   # one, w/ ceiling
    python benchmarks/flop_count.py train                # train MFU table
"""

import sys

PEAK_TFS = 197.0  # v5e bf16 peak


# (model_channels, in_ch, out_ch, mult, nres, attn_ds, (H, W) latent,
#  ctx tokens, vae=(ch, mult, nres, z, out_hw))
VARIANTS = {
    "interp_256": dict(
        mc=224, in_ch=5, out_ch=4, mult=(1, 2, 4, 4), nres=2,
        attn_ds=(1, 2, 4), hw=(32, 24), ctx_t=87,
        vae=dict(ch=128, mult=(1, 2, 4, 4), nres=2, z=4, out_hw=(256, 192)),
    ),
    "mm_512": dict(
        mc=224, in_ch=5, out_ch=4, mult=(1, 2, 4, 4), nres=2,
        attn_ds=(1, 2, 4), hw=(64, 48), ctx_t=87,
        vae=dict(ch=128, mult=(1, 2, 4, 4), nres=2, z=4, out_hw=(512, 384)),
    ),
    "upscale": dict(
        mc=256, in_ch=6, out_ch=3, mult=(1, 2, 2, 4), nres=2,
        attn_ds=(2, 4, 8), hw=(128, 96), ctx_t=86,
        vae=dict(ch=128, mult=(1, 2, 4), nres=2, z=3, out_hw=(512, 384)),
    ),
}

CTX_D = 768


def conv(h, w, cin, cout, k=3):
    return 2 * h * w * k * k * cin * cout


def dense(rows, cin, cout):
    return 2 * rows * cin * cout


def unet_flops(v, verbose=False):
    mc, mult, nres = v["mc"], v["mult"], v["nres"]
    attn_ds, ctx_t = v["attn_ds"], v["ctx_t"]
    t_emb = 4 * mc
    H, W = v["hw"]

    def resblock(h, w, cin, cout):
        f = conv(h, w, cin, cout) + conv(h, w, cout, cout)
        f += dense(1, t_emb, cout)  # FiLM emb proj (per image)
        if cin != cout:
            f += conv(h, w, cin, cout, k=1)
        return f

    def transformer(h, w, c):
        t = h * w
        f = dense(t, c, c) * 2              # proj_in/out (1x1 equiv)
        f += dense(t, c, 3 * c)             # self qkv
        f += 2 * 2 * t * t * c              # scores + pv (all heads)
        f += dense(t, c, c)                 # self out
        f += dense(t, c, c)                 # cross q (k/v hoisted per sample)
        f += 2 * 2 * t * ctx_t * c          # cross scores + pv
        f += dense(t, c, c)                 # cross out
        f += dense(t, c, 8 * c) + dense(t, 4 * c, c)  # GEGLU FF
        return f

    total = 0
    skips = []
    h, w = H, W
    ch = mc
    total += conv(h, w, v["in_ch"], mc)
    skips.append((h, w, mc))
    ds = 1
    per_level = {}
    for i, m in enumerate(mult):
        out = mc * m
        lvl = 0
        for _ in range(nres):
            lvl += resblock(h, w, ch, out)
            ch = out
            if ds in attn_ds:
                lvl += transformer(h, w, ch)
            skips.append((h, w, ch))
        if i != len(mult) - 1:
            lvl += conv(h // 2, w // 2, ch, ch)  # stride-2 downsample
            h, w, ds = h // 2, w // 2, ds * 2
            skips.append((h, w, ch))
        per_level[f"down_{i}"] = lvl
        total += lvl

    mid = resblock(h, w, ch, ch) + transformer(h, w, ch) + resblock(h, w, ch, ch)
    per_level["mid"] = mid
    total += mid

    for i in reversed(range(len(mult))):
        out = mc * mult[i]
        lvl = 0
        for j in range(nres + 1):
            sh, sw, sc = skips.pop()
            lvl += resblock(h, w, ch + sc, out)
            ch = out
            if ds in attn_ds:
                lvl += transformer(h, w, ch)
            if i and j == nres:
                lvl += conv(h * 2, w * 2, ch, ch)  # upsample conv
                h, w, ds = h * 2, w * 2, ds // 2
        per_level[f"up_{i}"] = lvl
        total += lvl

    total += conv(h, w, ch, v["out_ch"])  # out head (GN+SiLU negligible)
    if verbose:
        for k, f in per_level.items():
            print(f"  {k:>8s}: {f/1e9:7.2f} GF")
    return total


def decoder_flops(v):
    """First-stage decoder (model.py:462-568): conv_in, mid res+attn+res,
    reversed levels of (nres+1) resblocks + nearest-up conv, conv_out."""
    d = v["vae"]
    ch, mult, nres, z = d["ch"], d["mult"], d["nres"], d["z"]
    oh, ow = d["out_hw"]
    f_down = 2 ** (len(mult) - 1)
    h, w = oh // f_down, ow // f_down  # latent grid

    def resblock(hh, ww, cin, cout):
        f = conv(hh, ww, cin, cout) + conv(hh, ww, cout, cout)
        if cin != cout:
            f += conv(hh, ww, cin, cout, k=1)
        return f

    c = ch * mult[-1]
    total = conv(h, w, z, z, k=1)  # post_quant_conv
    total += conv(h, w, z, c)      # conv_in
    # mid: res, attn (full T^2 at latent res), res
    t = h * w
    total += resblock(h, w, c, c)
    total += dense(t, c, c) * 4 + 2 * 2 * t * t * c  # qkv+proj + scores+pv
    total += resblock(h, w, c, c)
    for i in reversed(range(len(mult))):
        cout = ch * mult[i]
        for _ in range(nres + 1):
            total += resblock(h, w, c, cout)
            c = cout
        if i != 0:
            h, w = h * 2, w * 2
            total += conv(h, w, c, c)  # upsample conv
    total += conv(h, w, c, 3)  # conv_out
    return total


def encoder_flops(v):
    """Frozen first-stage ENCODER forward (model.py:368-460 layout):
    conv_in at image res, len(mult) levels of nres resblocks with a
    stride-2 downsample conv between levels, mid res+attn+res, conv_out
    to the 2z moments, quant_conv 1x1."""
    d = v["vae"]
    ch, mult, nres, z = d["ch"], d["mult"], d["nres"], d["z"]
    h, w = d["out_hw"]  # encoder input = output image resolution

    def resblock(hh, ww, cin, cout):
        f = conv(hh, ww, cin, cout) + conv(hh, ww, cout, cout)
        if cin != cout:
            f += conv(hh, ww, cin, cout, k=1)
        return f

    total = conv(h, w, 3, ch)  # conv_in
    c = ch
    for i, m in enumerate(mult):
        cout = ch * m
        for _ in range(nres):
            total += resblock(h, w, c, cout)
            c = cout
        if i != len(mult) - 1:
            h, w = h // 2, w // 2
            total += conv(h, w, c, c)  # asym-pad stride-2 downsample
    t = h * w
    total += resblock(h, w, c, c)
    total += dense(t, c, c) * 4 + 2 * 2 * t * t * c  # mid attn
    total += resblock(h, w, c, c)
    total += conv(h, w, c, 2 * z)        # conv_out -> moments
    total += conv(h, w, 2 * z, 2 * z, k=1)  # quant_conv
    return total


def train_flops(v):
    """One training step, per image: frozen-VAE encode (forward only;
    reference ddpm.py:830-845 encodes under no_grad) + U-Net fwd + bwd.
    bwd = 2x fwd — the standard convention (grad-wrt-input + grad-wrt-
    weight passes each cost one forward's MACs). AdamW/EMA elementwise
    FLOPs are negligible; their cost is HBM traffic, accounted separately
    in docs/PERF.md's train-step decomposition."""
    return encoder_flops(v) + 3 * unet_flops(v)


# Best measured train steps (benchmarks/bench_train.py / bench_512.py train,
# one v5e chip, bf16 compute + f32 masters/moments/EMA, synthetic batches;
# ledger rows in results.jsonl / docs/PERF.md train sections).
MEASURED_TRAIN_MS = {
    ("interp_256", 12): 76.9,
    ("interp_256", 24): 113.5,
    ("interp_256", 32): 142.8,
    ("mm_512", 8): 171.2,
    ("upscale", 8): 293.5,
}


def train_report():
    print(f"{'variant':>12s} {'bs':>3s} {'TF/img':>7s} {'ms/step':>8s} "
          f"{'img/s':>6s} {'MFU':>5s}")
    for (name, bs), ms in MEASURED_TRAIN_MS.items():
        v = VARIANTS[name]
        tf = train_flops(v) / 1e12
        rate = bs / ms * 1000
        mfu = rate * tf * 1e12 / (PEAK_TFS * 1e12)
        print(f"{name:>12s} {bs:3d} {tf:7.3f} {ms:8.1f} {rate:6.1f} "
              f"{mfu*100:4.0f}%")


def report(name, steps=50):
    v = VARIANTS[name]
    uf = unet_flops(v, verbose=True)
    df = decoder_flops(v)
    per_image = uf * steps + df
    sol = PEAK_TFS * 1e12 / per_image
    print(f"{name}: U-Net {uf/1e9:.1f} GF/image/step at "
          f"{v['hw'][0]}x{v['hw'][1]} latent, decode {df/1e9:.1f} GF/image")
    print(f"  DDIM-{steps} + decode = {per_image/1e12:.2f} TF/image -> "
          f"speed-of-light ~{sol:.1f} img/s/chip at 100% MFU "
          f"({PEAK_TFS:.0f} TF/s bf16)")
    return uf, df, sol


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "train":
        train_report()
    elif len(sys.argv) > 1 and sys.argv[1] in VARIANTS:
        report(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 50)
    else:
        for n in VARIANTS:
            report(n)
            print()
