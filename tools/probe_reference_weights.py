"""North-star gate keep-alive: probe the reference's published Google-Drive
artifacts (weights + datasets, /root/reference/README.md:90,109) once per
round. The top-1 parity gate against the real published checkpoints needs
these files; this environment has zero egress, so the probe is expected to
fail — but the moment it ever succeeds, download the weights, convert with
checkpoint/pth_converter.py and run the eval CLIs against BASELINE.md's
operative targets immediately (it supersedes the offline surrogate,
tests/test_pth_cli_e2e.py).

Usage: python tools/probe_reference_weights.py   (one JSON line; record the
result in BASELINE.md's probe log)
"""
from __future__ import annotations

import datetime
import json
import urllib.request

URLS = {
    "weights":
        "https://drive.google.com/drive/folders/"
        "11Pllunglo-_XcZSI80WheTKOeqceW9II?usp=sharing",
    "datasets":
        "https://drive.google.com/drive/folders/"
        "1eqnTRWLPH1FbhZdvnazt01fxp0vUN47n?usp=sharing",
}


def main():
    res = {"date": datetime.date.today().isoformat()}
    for name, url in URLS.items():
        try:
            r = urllib.request.urlopen(url, timeout=10)
            res[name] = f"HTTP {r.status}"
        except Exception as e:
            res[name] = f"unreachable ({type(e).__name__})"
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main()
