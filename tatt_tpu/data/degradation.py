"""Synthetic degradation pipeline (host-side, cv2).

Rebuilds the reference's manmade-degradation chain
(``dataset/dataset.py:422-489``): pre-blur (sigma 5-6) -> shot+read noise
-> Gaussian/bilateral noise reduction -> unsharp sharpening; plus the
random blur ensemble the train collate applies to pseudo-LR images
(``dataset.py:1636-1649``, imgaug).  imgaug is unavailable here, so the
ensemble re-implements each augmenter's semantics directly: MeanShiftBlur
is cv2.pyrMeanShiftFiltering with imgaug's sampled radii, Superpixels is a
from-scratch SLIC segmentation + per-segment p_replace averaging.
"""

from __future__ import annotations

import random

import cv2
import numpy as np
from PIL import Image


def fspecial_gaussian(size: int = 15, sigma: float = 1.0) -> np.ndarray:
    """Matlab-style Gaussian kernel (``utils/utils_deblur.fspecial``, the
    only KAIR helper the reference reaches — ``dataset.py:36``)."""
    ax = np.arange(size) - (size - 1) / 2.0
    xx, yy = np.meshgrid(ax, ax)
    k = np.exp(-(xx**2 + yy**2) / (2.0 * sigma**2))
    return k / k.sum()


def srmd_degradation(
    img: Image.Image, kernel: np.ndarray | None = None, sf: int = 3
) -> Image.Image:
    """SRMD blur + bicubic downsample (``utils/utils_sisr.srmd_degradation``,
    reached via ``alignCollate_syn.degradation``, ``dataset.py:1678-1694``)."""
    if kernel is None:
        kernel = fspecial_gaussian(15, 1.0)
    arr = np.asarray(img).astype(np.float32)
    blurred = cv2.filter2D(arr, -1, kernel, borderType=cv2.BORDER_WRAP)
    out = Image.fromarray(np.clip(blurred, 0, 255).astype(np.uint8))
    return out.resize((img.width // sf, img.height // sf), Image.BICUBIC)


def gauss_unsharp_mask(rgb: np.ndarray, k: int, sigma: float, gain: float):
    lf = cv2.GaussianBlur(rgb, (k, k), sigma)
    hf = rgb - lf
    return np.clip(rgb + hf * gain, 0.0, 255.0), lf


def add_shot_gauss_noise(
    rgb: np.ndarray, shot_noise_mean: float, read_noise: float, rng=np.random
) -> np.ndarray:
    noise_var = shot_noise_mean * rgb + read_noise
    noise = rng.normal(loc=0.0, scale=np.sqrt(noise_var))
    if rgb.mean() > 252.0:
        return rgb
    return np.clip(rgb + noise, 0.0, 255.0)


def manmade_degradation(src_img: Image.Image, rng: random.Random | None = None) -> Image.Image:
    """``degradation()`` (``dataset.py:442-489``)."""
    rng = rng or random
    gt = np.asarray(src_img).astype(np.float32)

    k = rng.choice([3, 5])
    pre = cv2.GaussianBlur(gt, (k, k), rng.uniform(5.0, 6.0))

    if rng.random() > 0.2:
        noised = add_shot_gauss_noise(
            pre, rng.uniform(0, 0.005), rng.uniform(0, 0.015)
        )
    else:
        noised = pre

    noised = np.round(noised).astype(np.uint8)
    if rng.uniform(0, 1.0) < 0.7:
        nk = rng.choice([3, 5])
        nr = cv2.GaussianBlur(noised, (nk, nk), rng.uniform(2.0, 3.0))
    else:
        nr = cv2.bilateralFilter(
            noised, 7, rng.uniform(70, 80), rng.uniform(70, 80)
        )

    nr = nr.astype(np.float32)
    sk = rng.choice([3, 5])
    sharp, _ = gauss_unsharp_mask(nr, sk, rng.uniform(2.0, 3.0), rng.uniform(3.0, 4.0))
    return Image.fromarray(sharp.astype(np.uint8))


def _motion_blur(img: np.ndarray, k: int, rng) -> np.ndarray:
    kernel = np.zeros((k, k), np.float32)
    angle = rng.uniform(0, 180)
    c = (k - 1) / 2
    dx, dy = np.cos(np.radians(angle)), np.sin(np.radians(angle))
    for t in np.linspace(-c, c, k * 2):
        x, y = int(round(c + t * dx)), int(round(c + t * dy))
        if 0 <= x < k and 0 <= y < k:
            kernel[y, x] = 1
    kernel /= max(kernel.sum(), 1)
    return cv2.filter2D(img, -1, kernel)


def slic_segments(
    img: np.ndarray, n_segments: int, compactness: float = 10.0, n_iter: int = 10
) -> np.ndarray:
    """SLIC superpixel segmentation (Achanta et al. 2012) — the algorithm
    behind ``skimage.segmentation.slic``, which ``iaa.Superpixels`` wraps
    (``dataset.py:1646``): localized k-means over (L,a,b,y,x) features with
    the distance ``d_lab + (compactness/S) * d_xy``.  Returns an int32
    label map [H, W]."""
    h, w = img.shape[:2]
    n_segments = max(int(n_segments), 1)
    lab = cv2.cvtColor(
        np.ascontiguousarray(img, np.uint8), cv2.COLOR_RGB2LAB
    ).astype(np.float32)

    step = max(int(np.sqrt(h * w / n_segments)), 1)
    ys = np.arange(step // 2, h, step)
    xs = np.arange(step // 2, w, step)
    if ys.size == 0:
        ys = np.array([h // 2])
    if xs.size == 0:
        xs = np.array([w // 2])
    centers = np.array(
        [[lab[y, x, 0], lab[y, x, 1], lab[y, x, 2], y, x] for y in ys for x in xs],
        np.float32,
    )

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ratio = (compactness / step) ** 2
    labels = np.zeros((h, w), np.int32)
    for _ in range(n_iter):
        dist = np.full((h, w), np.inf, np.float32)
        for ci, c in enumerate(centers):
            y0, y1 = max(int(c[3]) - step, 0), min(int(c[3]) + step + 1, h)
            x0, x1 = max(int(c[4]) - step, 0), min(int(c[4]) + step + 1, w)
            if y0 >= y1 or x0 >= x1:
                continue
            patch = lab[y0:y1, x0:x1]
            d_lab = ((patch - c[:3]) ** 2).sum(axis=-1)
            d_xy = (yy[y0:y1, x0:x1] - c[3]) ** 2 + (xx[y0:y1, x0:x1] - c[4]) ** 2
            d = d_lab + ratio * d_xy
            win = dist[y0:y1, x0:x1]
            better = d < win
            win[better] = d[better]
            labels[y0:y1, x0:x1][better] = ci
        for ci in range(len(centers)):
            m = labels == ci
            if m.any():
                centers[ci, :3] = lab[m].mean(axis=0)
                centers[ci, 3] = yy[m].mean()
                centers[ci, 4] = xx[m].mean()
    return labels


def _superpixels(img: np.ndarray, n_segments: int, p_replace: float, rng) -> np.ndarray:
    """``iaa.Superpixels(p_replace, n_segments)`` semantics: SLIC segment,
    then replace each segment by its average color with per-segment
    probability ``p_replace``."""
    labels = slic_segments(img, n_segments)
    out = img.copy()
    for ci in np.unique(labels):
        if rng.random() < p_replace:
            m = labels == ci
            out[m] = img[m].mean(axis=0).astype(img.dtype)
    return out


def blur_ensemble(img: Image.Image, rng: random.Random | None = None, p: float = 0.2) -> Image.Image:
    """The collate's random blur ensemble (``dataset.py:1636-1649``):
    each of 7 augmenters applies with probability ``p``, random order."""
    rng = rng or random
    arr = np.asarray(img)

    def gaussian(a):
        return cv2.GaussianBlur(a, (5, 5), rng.uniform(0.0, 3.0) + 1e-6)

    def average(a):
        k = rng.choice([1, 3, 5])
        return cv2.blur(a, (k, k))

    def median(a):
        k = rng.choice([3, 5, 7])
        return cv2.medianBlur(a, k)

    def bilateral(a):
        d = rng.choice([3, 5, 7, 9])
        return cv2.bilateralFilter(a, d, rng.uniform(10, 250), rng.uniform(10, 250))

    def motion(a):
        return _motion_blur(a, 3, rng)

    def meanshift(a):
        # iaa.MeanShiftBlur wraps cv2.pyrMeanShiftFiltering with radii
        # drawn uniformly from (5.0, 40.0) each
        return cv2.pyrMeanShiftFiltering(
            a, sp=rng.uniform(5.0, 40.0), sr=rng.uniform(5.0, 40.0)
        )

    def superpixels(a):
        return _superpixels(a, rng.randint(1, 7), rng.uniform(0.1, 0.5), rng)

    augs = [gaussian, average, median, bilateral, motion, meanshift, superpixels]
    rng.shuffle(augs)
    for aug in augs:
        if rng.random() < p:
            arr = aug(np.ascontiguousarray(arr))
    return Image.fromarray(arr)
