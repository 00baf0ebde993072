#!/usr/bin/env python
"""Fetch the current EiBi shortwave schedule and install it as the user
station DB.

The reference vendors a 555 kB eibi.csv snapshot (application/eibi.csv,
parsed by presets.cpp; presets.h:43-133).  Snapshots go stale — EiBi
publishes two schedules a year — so instead of shipping one we fetch the
CURRENT season, convert it with utils.settings.import_eibi_csv, and write it
where utils.settings.load_stations() picks it up automatically
(~/.pebblesdr_tpu/stations.csv, or $PEBBLESDR_STATIONS).  After that,
`--stations db` monitors the real broadcast lineup:

    python tools/fetch_eibi.py                       # fetch current season
    python tools/fetch_eibi.py --langs E             # English-language only
    python tools/fetch_eibi.py --input sked-b25.csv  # convert a local file
    python -m pebblesdr_tpu.serve.cli --stations db --center 9500000 ...

EiBi season codes: 'a' (summer, end of March on) / 'b' (winter, end of
October on) + 2-digit year, e.g. a25, b25.
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pebblesdr_tpu.utils import settings  # noqa: E402

EIBI_URL = "http://www.eibispace.de/dx/sked-{season}.csv"


def current_season(today: datetime.date | None = None) -> str:
    """EiBi season code for a date: A-season runs from the last Sunday of
    March, B-season from the last Sunday of October (approximated to the
    month boundary — the schedule files overlap anyway)."""
    d = today or datetime.date.today()
    if d.month in (11, 12):
        return f"b{d.year % 100:02d}"
    if d.month in (1, 2, 3):
        return f"b{(d.year - 1) % 100:02d}"
    return f"a{d.year % 100:02d}"


def fetch(url: str, timeout: float = 30.0) -> str:
    """Download to a temp file; returns the local path."""
    import tempfile
    import urllib.request

    fd, path = tempfile.mkstemp(suffix=".csv", prefix="eibi-")
    os.close(fd)
    print(f"fetching {url} ...", file=sys.stderr)
    with urllib.request.urlopen(url, timeout=timeout) as r, \
            open(path, "wb") as f:
        f.write(r.read())
    return path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--season", default=None,
                   help="EiBi season code (e.g. a25, b25); default: current")
    p.add_argument("--url", default=None, help="override the download URL")
    p.add_argument("--input", default=None,
                   help="convert an already-downloaded sked-*.csv instead "
                        "of fetching")
    p.add_argument("--out", default=None,
                   help="output Preset CSV (default: the user station DB "
                        f"{settings.USER_STATIONS}, which --stations db "
                        "reads automatically)")
    p.add_argument("--langs", default=None,
                   help="comma list of EiBi language codes to keep (e.g. E)")
    args = p.parse_args(argv)

    src = args.input
    if src is None:
        url = args.url or EIBI_URL.format(
            season=args.season or current_season())
        try:
            src = fetch(url)
        except Exception as e:  # noqa: BLE001 — report & fail cleanly
            print(f"fetch failed: {e}\n(no network? download sked-*.csv "
                  f"from eibispace.de and rerun with --input)",
                  file=sys.stderr)
            return 1

    langs = tuple(s.strip() for s in args.langs.split(",")) if args.langs \
        else ()
    presets = settings.import_eibi_csv(src, langs=langs)
    if not presets:
        print(f"no stations parsed from {src}", file=sys.stderr)
        return 1

    out = args.out or os.path.expanduser(
        os.environ.get("PEBBLESDR_STATIONS", settings.USER_STATIONS))
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    settings.save_presets_csv(out, presets)
    lo = min(p_.freq_hz for p_ in presets) / 1e6
    hi = max(p_.freq_hz for p_ in presets) / 1e6
    print(f"{len(presets)} stations ({lo:.3f}-{hi:.3f} MHz) -> {out}")
    print("use:  python -m pebblesdr_tpu.serve.cli --stations db "
          "--center <Hz> ...")
    return 0


if __name__ == "__main__":
    sys.exit(main())
