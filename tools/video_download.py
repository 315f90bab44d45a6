"""COIN video downloader (reference ``tools/video_download.py:17-28``):
reads the COIN annotation JSON and fetches each YouTube video with yt-dlp."""

from __future__ import annotations

import argparse
import json
import os
import subprocess


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--annotations", default="COIN.json")
    p.add_argument("--out_dir", default="videos")
    args = p.parse_args()

    with open(args.annotations) as f:
        data = json.load(f)["database"]
    os.makedirs(args.out_dir, exist_ok=True)
    for vid, info in data.items():
        url = info.get("video_url", f"https://www.youtube.com/watch?v={vid}")
        out = os.path.join(args.out_dir, f"{vid}.%(ext)s")
        subprocess.run(
            ["yt-dlp", "-f", "best[height<=480]", "-o", out, url],
            check=False,
        )


if __name__ == "__main__":
    main()
