#!/usr/bin/env python
"""HIT post-processing driver — the post.sh analog
(/root/reference/Src/PythonScripts/Turbulence_analysis/post.sh), chaining:
  1. [optional] augment every plotfile with vorticity + divergence
     (the AugmentPlotfile step)
  2. time-series scrape -> <folder>/tseries.csv
  3. velocity/vorticity spectra of the LAST plotfile (turbulenceSpectra,
     the AmrDeriveSpectrum step)
  4. slice scrape of the last plotfile

Usage: python scripts/post_hit.py <folder> [augment(0|1)]
"""
import sys

from peleanalysis_tpu.cli import main as cli
from peleanalysis_tpu.tools.turbulence_post import _list_plotfiles


def run(folder: str, augment: bool = False) -> None:
    plts = _list_plotfiles(folder)
    if not plts:
        raise SystemExit(f"no plt[0-9]* plotfiles under {folder}")
    if augment:
        print("Augmenting Plotfiles...")
        for p in plts:
            cli(["augmentPlotfile", f"infile={p}", f"outfile={p}_aug"])
    print(f"Computing time series for {folder}.")
    cli(["turbulenceTseries", f"root_dir={folder}"])
    last = plts[-1]
    print(f"Last plotfile:\t{last}")
    cli(["turbulenceSpectra", f"infile={last}",
         f"outfile_base={last}/vel"])
    cli(["turbulenceSlice", f"root_dir={folder}", f"plotfile={last}"])


if __name__ == "__main__":
    run(sys.argv[1], bool(int(sys.argv[2])) if len(sys.argv) > 2 else False)
