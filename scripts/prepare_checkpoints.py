"""Download external assets for the pedestrian pipeline (reference
scripts/prepare_checkpoints.py: HMR2/4D-Humans + SMPL + SegFormer).

Prints the required artifacts and fetches what it can; SMPL body models need
manual license acceptance (same as the reference).
"""
from __future__ import annotations

import os
import sys
import urllib.request

ASSETS = {
    "pretrained/segformer.b5.1024x1024.city.160k.pth":
        "https://huggingface.co/anonymous/SegFormer/resolve/main/"
        "segformer.b5.1024x1024.city.160k.pth",
    # HMR2 checkpoints are fetched by the 4D-Humans package itself on first use.
}

MANUAL = """
Manual steps (license-gated, same as the reference):
 1. SMPL neutral body model: register at https://smpl.is.tue.mpg.de and place
    basicModel_neutral_lbs_10_207_0_v1.0.0.pkl under pretrained/smpl/
 2. pip install the 4D-Humans (HMR2) package; it downloads its checkpoint on use.
 3. T5-XXL: huggingface-cli download google/t5-v1_1-xxl --local-dir pretrained/t5-v1_1-xxl
 4. CogVideoX-2b VAE: huggingface-cli download THUDM/CogVideoX-2b vae --local-dir pretrained/CogVideoX-2b
"""


def main():
    os.makedirs("pretrained", exist_ok=True)
    for path, url in ASSETS.items():
        if os.path.exists(path):
            print(f"have {path}")
            continue
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            print(f"fetching {url} ...")
            urllib.request.urlretrieve(url, path)
        except Exception as e:
            print(f"  could not fetch ({e}); get it manually")
    print(MANUAL)


if __name__ == "__main__":
    main()
