"""Dataset acquisition: Pixabay image downloader.

Rebuild of the reference's dataset scraper
(DowloandImages/pixabay_skript.py:5-163): queries the Pixabay API for
monument photos and saves `target_count` images into `output_dir`, with
pagination, dedup by image id, and polite rate limiting.

This build environment has no network egress, so the downloader is fully
implemented but returns a clear error when the network is unreachable;
`generate_synthetic_dataset` provides an offline stand-in that produces a
seeded multi-view synthetic "monument" folder for pipeline testing.
"""

from __future__ import annotations

import json
import time
import urllib.parse
import urllib.request
from pathlib import Path
from typing import Dict, List, Optional

PIXABAY_URL = "https://pixabay.com/api/"


def download_pixabay_images(output_dir, query: str = "statue of liberty",
                            target_count: int = 50,
                            api_key: Optional[str] = None,
                            per_page: int = 50,
                            delay_s: float = 0.3) -> Dict:
    """pixabay_skript.py:5-163 equivalent. Requires network + API key."""
    if not api_key:
        raise ValueError("Pixabay API key required (reference reads it "
                         "from the environment)")
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    seen: set = set()
    saved: List[str] = []
    page = 1
    while len(saved) < target_count:
        params = urllib.parse.urlencode({
            "key": api_key, "q": query, "image_type": "photo",
            "per_page": per_page, "page": page,
        })
        try:
            with urllib.request.urlopen(f"{PIXABAY_URL}?{params}",
                                        timeout=20) as r:
                data = json.loads(r.read())
        except OSError as e:
            raise RuntimeError(
                f"network unreachable (zero-egress environment?): {e}"
            ) from e
        hits = data.get("hits", [])
        if not hits:
            break
        for h in hits:
            if h["id"] in seen:
                continue
            seen.add(h["id"])
            url = h.get("largeImageURL") or h.get("webformatURL")
            name = f"pixabay_{h['id']}.jpg"
            try:
                with urllib.request.urlopen(url, timeout=30) as img:
                    (out / name).write_bytes(img.read())
                saved.append(name)
            except OSError:
                continue
            if len(saved) >= target_count:
                break
            time.sleep(delay_s)
        page += 1
    return {"downloaded": len(saved), "files": saved,
            "output_dir": str(out)}


def generate_synthetic_dataset(output_dir, n_views: int = 10,
                               width: int = 640, height: int = 480,
                               seed: int = 42) -> Dict:
    """Offline stand-in: a seeded synthetic 'monument' rendered from a
    slowly rotating viewpoint (overlapping views with real parallax-like
    drift, suitable for the matching + SfM pipelines)."""
    import numpy as np
    from PIL import Image
    from tpu3drec.bench.synthetic import SyntheticImageGenerator, _warp

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    gen = SyntheticImageGenerator(width=int(width * 1.4),
                                  height=int(height * 1.4), seed=seed)
    base = gen.generate()
    files = []
    cx, cy = base.shape[1] / 2, base.shape[0] / 2
    for i in range(n_views):
        a = (i - n_views / 2) * 0.03
        s = 1.0 + 0.01 * (i - n_views / 2)
        H = np.array([[s * np.cos(a), -s * np.sin(a),
                       cx * (1 - s * np.cos(a)) + cy * s * np.sin(a) + 6 * i],
                      [s * np.sin(a), s * np.cos(a),
                       cy * (1 - s * np.cos(a)) - cx * s * np.sin(a)],
                      [0, 0, 1.0]])
        view = _warp(base, H)
        crop = view[:height, :width]
        name = f"synthetic_{i:03d}.png"
        Image.fromarray((np.clip(crop, 0, 1) * 255).astype(np.uint8)).save(
            out / name)
        files.append(name)
    return {"generated": len(files), "files": files, "output_dir": str(out)}
