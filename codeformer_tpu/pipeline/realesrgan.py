"""Real-ESRGAN background/face upsampler with tiled, batched inference.

Behavioral spec: basicsr/utils/realesrgan_utils.py (RealESRGANer: pre_pad,
mod_pad, tile_pad seam handling, 0-255 BGR in/out). TPU-first redesign:
instead of a Python loop over tiles (realesrgan_utils.py:100-163), the image
is cut into a static grid of overlapping tiles that run as ONE batched jit
call, and the upscaled tiles are re-assembled with the same seam-cropping
arithmetic. Static tile shape = one compile, any image size.
"""
from __future__ import annotations

import math
from typing import Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from codeformer_tpu.models import RRDBNet
from codeformer_tpu.utils.checkpoint import init_params_fast, load_checkpoint
from codeformer_tpu.utils.misc import setup_jax

REALESRGAN_X2_WEIGHTS = 'weights/realesrgan/RealESRGAN_x2plus.pth'


class RealESRGANer:
    """Tiled x`scale` upsampler. enhance(img_bgr, outscale) -> (img, mode)
    mirroring the reference's API (realesrgan_utils.py:176-252)."""

    def __init__(self, scale: int = 2, model_path: Optional[str] = None,
                 model: Optional[RRDBNet] = None, tile: int = 400,
                 tile_pad: int = 10, pre_pad: int = 0,
                 tile_batch: int = 4, allow_random: bool = False,
                 dtype=jnp.bfloat16):
        setup_jax()
        self.scale = scale
        self.tile_size = tile
        self.tile_pad = tile_pad
        self.pre_pad = pre_pad
        self.tile_batch = tile_batch
        self.model = model or RRDBNet(num_in_ch=3, num_out_ch=3,
                                      num_feat=64, num_block=23,
                                      num_grow_ch=32, scale=scale,
                                      dtype=dtype)
        import os
        path = model_path or REALESRGAN_X2_WEIGHTS
        if os.path.exists(path):
            self.variables = load_checkpoint(path)
        elif allow_random:
            self.variables = init_params_fast(
                self.model, jnp.zeros((1, 64, 64, 3), dtype))
        else:
            raise FileNotFoundError(
                f'RealESRGAN weights not found at {path}')
        self.variables = jax.device_put(self.variables)

        def _fwd(variables, tiles):
            # tiles: (N, t, t, 3) float32 RGB [0,1]; returns uint8 0-255 so
            # only 1 byte/px crosses the (slow) device->host link
            out = self.model.apply(variables, tiles.astype(dtype))
            out = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
            return jnp.round(out * 255.0).astype(jnp.uint8)

        self._jfwd = jax.jit(_fwd)

    def _process_whole(self, img01: np.ndarray) -> np.ndarray:
        # mod-pad to a multiple of scale: the scale-2 model pixel-unshuffles
        # its input, so odd dims would fail (ref RealESRGANer.pre_process
        # mod_pad, realesrgan_utils.py:79-87)
        h, w = img01.shape[:2]
        mod = self.scale
        ph = (mod - h % mod) % mod
        pw = (mod - w % mod) % mod
        if ph or pw:
            img01 = np.pad(img01, ((0, ph), (0, pw), (0, 0)),
                           mode='reflect')
        out = np.asarray(self._jfwd(self.variables,
                                    jnp.asarray(img01[None])))
        out = out[0].astype(np.float32) / 255.0
        if ph or pw:
            out = out[:h * self.scale, :w * self.scale]
        return out

    def _process_tiled(self, img01: np.ndarray) -> np.ndarray:
        h, w, c = img01.shape
        t = self.tile_size
        pad = self.tile_pad
        s = self.scale
        tiles_x = math.ceil(w / t)
        tiles_y = math.ceil(h / t)

        # pad image so the padded-tile windows always fit
        padded = np.pad(img01, ((pad, t * tiles_y - h + pad),
                                (pad, t * tiles_x - w + pad), (0, 0)),
                        mode='edge')
        tin = t + 2 * pad
        tiles = []
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                y0 = ty * t
                x0 = tx * t
                tiles.append(padded[y0:y0 + tin, x0:x0 + tin])
        # fixed chunk size => one compiled graph regardless of image size
        chunk = self.tile_batch
        outs = []
        for i in range(0, len(tiles), chunk):
            part = tiles[i:i + chunk]
            n = len(part)
            if n < chunk:
                part = part + [np.zeros_like(part[0])] * (chunk - n)
            res = np.asarray(self._jfwd(self.variables,
                                        jnp.asarray(np.stack(part))))
            outs.append(res[:n].astype(np.float32) / 255.0)
        out_tiles = np.concatenate(outs)
        out = np.zeros((h * s, w * s, c), np.float32)
        i = 0
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                ot = out_tiles[i]
                i += 1
                core = ot[pad * s:(pad + t) * s, pad * s:(pad + t) * s]
                y0, x0 = ty * t * s, tx * t * s
                ch = min(t * s, h * s - y0)
                cw = min(t * s, w * s - x0)
                out[y0:y0 + ch, x0:x0 + cw] = core[:ch, :cw]
        return out

    def enhance(self, img: np.ndarray, outscale: Optional[float] = None,
                alpha_upsampler: str = 'realesrgan'):
        """img: uint8 BGR (or 16-bit / gray / BGRA). Returns (output, mode)
        like the reference (realesrgan_utils.py:176-252)."""
        h_input, w_input = img.shape[0], img.shape[1]
        img = img.astype(np.float32)
        if np.max(img) > 256:
            max_range = 65535.0
            img_mode = '16bit'
        else:
            max_range = 255.0
            img_mode = 'RGB'
        img = img / max_range
        if len(img.shape) == 2:
            img_mode = 'L'
            img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
        elif img.shape[2] == 4:
            img_mode = 'RGBA'
            alpha = img[:, :, 3]
            img = img[:, :, 0:3]

        rgb = img[..., ::-1]
        if (self.tile_size > 0
                and max(rgb.shape[:2]) > self.tile_size):
            out_rgb = self._process_tiled(rgb)
        else:
            out_rgb = self._process_whole(rgb)
        output = out_rgb[..., ::-1]

        if img_mode == 'RGBA':
            a_up = cv2.resize(
                alpha, (w_input * self.scale, h_input * self.scale),
                interpolation=cv2.INTER_LINEAR)
            output = np.concatenate([output, a_up[..., None]], axis=2)

        if img_mode == 'L':
            output = cv2.cvtColor(
                (output * 255).astype(np.uint8), cv2.COLOR_BGR2GRAY)
            output = output.astype(np.float32) / 255.0

        if outscale is not None and outscale != float(self.scale):
            output = cv2.resize(
                output, (int(w_input * outscale), int(h_input * outscale)),
                interpolation=cv2.INTER_LANCZOS4)
        if max_range == 65535:
            output = (output * 65535.0).round().astype(np.uint16)
        else:
            output = (output * 255.0).round().astype(np.uint8)
        return output, img_mode


def set_realesrgan(tile: int = 400, allow_random: bool = False
                   ) -> RealESRGANer:
    """Builds the x2 background upsampler like the reference CLI
    (inference_codeformer.py:19-53)."""
    return RealESRGANer(scale=2, tile=tile, tile_pad=40, pre_pad=0,
                        allow_random=allow_random)
