#!/usr/bin/env python
"""Fetch the Middlebury optical-flow training set into data/middlebury/.

SURVEY.md §4 rung 6: the EPE gate test (tests/integration/test_middlebury.py)
auto-skips when data/middlebury/ is absent; run this in a network-enabled
environment to arm it. This machine has zero egress (SURVEY.md §0), so the
script exists for reproduction elsewhere.

Layout produced:
    data/middlebury/other-data/<seq>/frame10.png, frame11.png
    data/middlebury/other-gt-flow/<seq>/flow10.flo
"""

import io
import os
import sys
import urllib.request
import zipfile

BASE = "https://vision.middlebury.edu/flow/data/comp/zip"
ARCHIVES = ["other-color-twoframes.zip", "other-gt-flow.zip"]


def main(dest="data/middlebury"):
    os.makedirs(dest, exist_ok=True)
    for name in ARCHIVES:
        url = f"{BASE}/{name}"
        print(f"fetching {url} ...")
        try:
            with urllib.request.urlopen(url, timeout=60) as r:
                blob = r.read()
        except Exception as e:
            print(f"  FAILED: {e}\n  (no network? run this somewhere with egress)")
            return 1
        with zipfile.ZipFile(io.BytesIO(blob)) as z:
            z.extractall(dest)
        print(f"  extracted into {dest}/")
    print("done — tests/integration/test_middlebury.py is now armed")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
