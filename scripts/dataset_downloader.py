"""Download the Oxford-IIIT-Pet-Augmented splits and build array caches.

Reference: scripts/dataset_downloader.py (whose __main__ downloads the train
split twice and never test — SURVEY.md §7 known defects; fixed here).

    python -m scripts.dataset_downloader --dest Data/Oxford-IIIT-Pet-Augmented
"""

from __future__ import annotations

import argparse


def download_huggingface_dataset(
    dataset_id: str, save_path: str, split: str
) -> None:
    from datasets import load_dataset

    load_dataset(dataset_id, split=split, cache_dir=save_path)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dest", default="Data/Oxford-IIIT-Pet-Augmented")
    ap.add_argument(
        "--splits", nargs="+", default=["train", "validation", "test"]
    )
    args = ap.parse_args()

    from image_segmentation_tpu.data.datasets import load_pet_dataset

    for split in args.splits:
        ds = load_pet_dataset(split=split, dataset_loc=args.dest, cache=True)
        print(f"{split}: {len(ds)} items cached under {args.dest}")


if __name__ == "__main__":
    main()
