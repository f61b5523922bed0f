"""Measure warped-template footprint statistics for decoder-ll culling.

The fused decoder-ll (XLA and Pallas paths) does dense work over every
(capsule m, pixel p) pair. Outside a template's footprint all bilinear
taps are zero and the component's mixture contribution reduces to the
closed form log(presence_m) — so block-level culling is EXACT. Whether
it is *profitable* depends on the pose distribution: the reference's
pose nonlinearity (cv_ops.py:20-76, scale = sigmoid+1e-2 <= 1.01) maps
canvas->template coordinates with scale <= ~1, which bounds how small a
footprint can get. This tool measures, under bench conditions (random
init + synthetic data, optionally after N train steps):

  * per-(b, m) footprint area fraction (pixels with any nonzero tap)
  * per-(m, tile) active fraction for candidate pixel tilings
  * mean active template-row count per (m, tile) (the h-loop trip count
    a dynamically-bounded warp loop would execute)

Usage: JAX_PLATFORMS=cpu python tools/footprint_stats.py [train_steps]
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128


def get_pose(train_steps: int):
    from scae_tpu.factory import make_scae
    from scae_tpu.optim import make_optimizer
    from scae_tpu.parallel.train_step import (
        create_train_state,
        make_train_scan,
    )
    from scae_tpu.train.loop import make_augment_fn

    mk = dict(
        image_shape=(1, 40, 40), n_classes=10,
        n_part_caps=40, n_obj_caps=32,
        pcae_cnn_encoder_params=dict(compute_dtype="bfloat16"),
        pcae_decoder_params=dict(fused_tap_dtype="bfloat16"),
        scae_params=dict(reconstruct_alternatives=False),
    )
    model = make_scae(mk)
    tx = make_optimizer("rmsprop", 3e-5, batch_size=BATCH,
                        lr_decay_rate=0.997, decay_steps=429)
    rng = np.random.RandomState(0)
    n_data = 4096
    data = {
        "image": jnp.asarray(rng.randint(0, 256, (n_data, 28, 28)),
                             jnp.uint8),
        "label": jnp.asarray(rng.randint(0, 10, n_data), jnp.int32),
    }
    example = {
        "image": jnp.zeros((BATCH, 1, 40, 40), jnp.float32),
        "label": jnp.zeros((BATCH,), jnp.int32),
    }
    state = create_train_state(model, tx, example, jax.random.PRNGKey(0))
    augment = make_augment_fn(canvas=40, max_shift=6)

    if train_steps:
        scan_fn = make_train_scan(model, tx, augment_fn=augment)
        done = 0
        while done < train_steps:
            n = min(100, train_steps - done)
            idxs = jnp.asarray(
                rng.randint(0, n_data, (n, BATCH)).astype(np.int32))
            state, metrics = scan_fn(state, data, idxs)
            done += n
        print(f"trained {done} steps, loss={float(metrics['loss'][-1]):.1f}")

    # a bench-like batch through the augment + part encoder
    imgs = (data["image"][:BATCH].astype(jnp.float32) / 255.0)[:, None]
    batch = augment({"image": imgs, "label": data["label"][:BATCH]},
                    jax.random.PRNGKey(7))
    pose = model.apply(
        {"params": state.params}, batch["image"],
        method=lambda m, img: m.part_encoder(img, deterministic=True).pose)
    return np.asarray(pose)  # (B, M, 6) rows (a, b, tx, c, d, ty)


def stats(pose, Ht=11, Wt=11, H=40, W=40):
    B, M, _ = pose.shape
    xs = (2.0 * np.arange(W) + 1.0) / W - 1.0
    ys = (2.0 * np.arange(H) + 1.0) / H - 1.0
    gx = np.broadcast_to(xs[None, :], (H, W)).reshape(-1)
    gy = np.broadcast_to(ys[:, None], (H, W)).reshape(-1)
    a, b, tx, c, d, ty = [pose[..., i] for i in range(6)]
    sx = a[..., None] * gx + b[..., None] * gy + tx[..., None]
    sy = c[..., None] * gx + d[..., None] * gy + ty[..., None]
    ix = ((sx + 1.0) * Wt - 1.0) * 0.5            # (B, M, P)
    iy = ((sy + 1.0) * Ht - 1.0) * 0.5
    inside = ((ix > -1.0) & (ix < Wt) & (iy > -1.0) & (iy < Ht))
    area = inside.mean(axis=-1)                   # (B, M)
    print(f"pose: a mean|.|={np.abs(a).mean():.3f}  "
          f"b={np.abs(b).mean():.3f}  c={np.abs(c).mean():.3f}  "
          f"d={np.abs(d).mean():.3f}  |tx|={np.abs(tx).mean():.3f}  "
          f"|ty|={np.abs(ty).mean():.3f}")
    print(f"footprint area fraction: mean={area.mean():.3f}  "
          f"p10={np.quantile(area, .1):.3f}  med={np.median(area):.3f}  "
          f"p90={np.quantile(area, .9):.3f}")

    inside_img = inside.reshape(B, M, H, W)
    iy_img = iy.reshape(B, M, H, W)

    for tr, tc in [(40, 40), (8, 40), (5, 40), (16, 8), (8, 8), (8, 16)]:
        nr, nc = H // tr, W // tc
        blk = inside_img[:, :, :nr * tr, :nc * tc].reshape(
            B, M, nr, tr, nc, tc)
        active = blk.any(axis=(3, 5))             # (B, M, nr, nc)
        frac = active.mean()
        # active template rows per active (m, tile): h with any tap != 0
        # (taps nonzero where |iy - h| < 1, iy in (-1, Ht))
        iyb = iy_img[:, :, :nr * tr, :nc * tc].reshape(
            B, M, nr, tr, nc, tc).transpose(0, 1, 2, 4, 3, 5)
        inb = blk.transpose(0, 1, 2, 4, 3, 5)
        hs = np.arange(Ht)
        act_h = (
            (np.abs(iyb[..., None] - hs) < 1.0)
            & inb[..., None]).any(axis=(4, 5))    # (B, M, nr, nc, Ht)
        trips = act_h.sum(axis=-1)[active]
        mean_trips = trips.mean() if trips.size else 0.0
        # effective work vs dense: active pairs x (trip/Ht)
        eff = frac * mean_trips / Ht
        print(f"tile {tr:>2}x{tc:<2}: active(m,tile)={frac:.3f}  "
              f"h-trips(active)={mean_trips:.2f}/{Ht}  "
              f"warp-work vs dense={eff:.3f}")


def window_stats(pose, Ht=11, Wt=11, H=40, W=40, group=8):
    """Realistic per-group dynamic h-window trip counts.

    A Pallas warp loop vectorized over a group of m's with a per-m start
    row h0_m and a shared dynamic trip count executes max-over-group
    (window width) iterations per (band, group). Windows per (b, m,
    band): h in [floor(min iy)-0, ceil(max iy)+1] clipped to [0, Ht)
    where iy ranges over the band's pixels (tap support |iy-h|<1).
    """
    B, M, _ = pose.shape
    xs = (2.0 * np.arange(W) + 1.0) / W - 1.0
    ys = (2.0 * np.arange(H) + 1.0) / H - 1.0
    gx = np.broadcast_to(xs[None, :], (H, W))
    gy = np.broadcast_to(ys[:, None], (H, W))
    a, b, tx, c, d, ty = [pose[..., i] for i in range(6)]
    sy = (c[..., None, None] * gx + d[..., None, None] * gy
          + ty[..., None, None])
    iy = ((sy + 1.0) * Ht - 1.0) * 0.5            # (B, M, H, W)
    sx = (a[..., None, None] * gx + b[..., None, None] * gy
          + tx[..., None, None])
    ix = ((sx + 1.0) * Wt - 1.0) * 0.5

    def trips(coord, n, rows, cols, label):
        nr, nc = H // rows, W // cols
        cb = coord[:, :, :nr * rows, :nc * cols].reshape(
            B, M, nr, rows, nc, cols)
        lo = np.maximum(np.ceil(cb.min(axis=(3, 5)) - 1.0), 0)
        hi = np.minimum(np.floor(cb.max(axis=(3, 5)) + 1.0), n - 1)
        w = np.maximum(hi - lo + 1, 0)            # (B, M, nr, nc)
        for sort in (False, True):
            ww = w.reshape(B, M, -1)
            if sort:
                # sort m's by mean window width across tiles
                order = np.argsort(ww.mean(axis=-1), axis=1)
                ww = np.take_along_axis(ww, order[..., None], axis=1)
            g = ww.reshape(B, M // group, group, -1).max(axis=2)
            print(f"  {label} {rows}x{cols}: mean={w.mean():.2f} "
                  f"group{group}-max={g.mean():.2f}"
                  f"{' (sorted)' if sort else ''} /{n}")

    def union_trips(coord, n, rows, cols, sort_key, label):
        """Per-(band, group) SHARED h-range: union of member windows.

        Kernel shape: fori(h_lo_g, h_hi_g) with STATIC template row
        indexing — no per-m alignment needed. m's pre-sorted by
        sort_key (one gather outside the kernel, same order for all
        bands).
        """
        nr, nc = H // rows, W // cols
        cb = coord[:, :, :nr * rows, :nc * cols].reshape(
            B, M, nr, rows, nc, cols)
        lo = np.maximum(np.ceil(cb.min(axis=(3, 5)) - 1.0), 0)
        hi = np.minimum(np.floor(cb.max(axis=(3, 5)) + 1.0), n - 1)
        order = np.argsort(sort_key, axis=1)      # (B, M)
        lo = np.take_along_axis(lo.reshape(B, M, -1), order[..., None], 1)
        hi = np.take_along_axis(hi.reshape(B, M, -1), order[..., None], 1)
        glo = lo.reshape(B, M // group, group, -1).min(axis=2)
        ghi = hi.reshape(B, M // group, group, -1).max(axis=2)
        u = np.maximum(ghi - glo + 1, 0)
        print(f"  {label} {rows}x{cols}: group{group}-union="
              f"{u.mean():.2f} p90={np.quantile(u, .9):.2f} /{n}")

    trips(iy, Ht, 8, 40, "h-window band")
    trips(iy, Ht, 5, 40, "h-window band")
    union_trips(iy, Ht, 8, 40, ty, "h-union(sort ty) band")
    union_trips(iy, Ht, 5, 40, ty, "h-union(sort ty) band")
    # oracle-ish static order: mean window center across the canvas
    center = iy.reshape(B, M, -1).mean(axis=-1)
    union_trips(iy, Ht, 8, 40, center, "h-union(sort ctr) band")
    union_trips(iy, Ht, 5, 40, center, "h-union(sort ctr) band")

    def per_band_sort_union(coord, n, rows, cols, label):
        """Design: re-sort m's PER BAND by window center (XLA gather),
        kernel uses a shared [lo, hi] per (band, group of 8)."""
        nr, nc = H // rows, W // cols
        cb = coord[:, :, :nr * rows, :nc * cols].reshape(
            B, M, nr, rows, nc, cols)
        lo = np.maximum(np.ceil(cb.min(axis=(3, 5)) - 1.0), 0)[..., 0]
        hi = np.minimum(np.floor(cb.max(axis=(3, 5)) + 1.0), n - 1)[..., 0]
        ctr = (lo + hi) / 2                       # (B, M, nr)
        order = np.argsort(ctr, axis=1)
        lo = np.take_along_axis(lo, order, axis=1)
        hi = np.take_along_axis(hi, order, axis=1)
        glo = lo.reshape(B, M // group, group, nr).min(axis=2)
        ghi = hi.reshape(B, M // group, group, nr).max(axis=2)
        u = np.maximum(ghi - glo + 1, 0)
        print(f"  {label} {rows}x{cols}: group{group}-union="
              f"{u.mean():.2f} p90={np.quantile(u, .9):.2f} /{n}")

    per_band_sort_union(iy, Ht, 8, 40, "h-union(per-band sort)")
    per_band_sort_union(iy, Ht, 5, 40, "h-union(per-band sort)")
    trips(iy, Ht, 8, 8, "h-window tile")
    trips(ix, Wt, 8, 40, "w-window band")
    trips(ix, Wt, 8, 8, "w-window tile")
    trips(iy, Ht, 40, 40, "h-window full")


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    cache = f"/tmp/scae_pose_{steps}.npy"
    try:
        pose = np.load(cache)
    except OSError:
        pose = get_pose(steps)
        np.save(cache, pose)
    stats(pose)
    window_stats(pose)
