"""Plot MuJoCo benchmark learning curves from tensorboard logs — the
analogue of the reference's examples/mujoco/plotter.py / analysis.py, built
on the rliable evaluation helpers (IQM + stratified bootstrap bands).

    python examples/mujoco/plotter.py log/sac_halfcheetah_seed* -o curve.png
"""

import sys as _sys
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import argparse

from tianshou_tpu.evaluation.rliable_evaluation import (
    load_and_eval_experiments,
    plot_iqm_curve,
)

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("log_dirs", nargs="+", help="one tensorboard run dir per seed")
    p.add_argument("-o", "--output", default="curve.png")
    p.add_argument("--title", default="")
    args = p.parse_args()
    grid, iqm_c, lo, hi, summary = load_and_eval_experiments(args.log_dirs)
    print(
        f"runs={summary.n_runs} final IQM={summary.iqm:.1f} "
        f"mean={summary.mean:.1f} median={summary.median:.1f} "
        f"95% CI=[{summary.ci_low:.1f}, {summary.ci_high:.1f}]"
    )
    plot_iqm_curve(grid, iqm_c, lo, hi, title=args.title, out_path=args.output)
    print(f"wrote {args.output}")
