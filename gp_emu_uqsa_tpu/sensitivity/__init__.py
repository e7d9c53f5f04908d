"""Sensitivity subpackage facade (reference `gp_emu_uqsa.sensitivity`).

    import gp_emu_uqsa_tpu.sensitivity as s
    sens = s.setup(emul, m, v)       # Sensitivity for a trained Emulator
    sens.uncertainty(); sens.sensitivity(); sens.main_effect(0)
    s.sense_table([sens1, sens2], inputNames, outputNames)

SURVEY.md S3/S4.4. `m`/`v` are the means/variances of the independent normal
input distributions in the emulator's (scaled) input space.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from gp_emu_uqsa_tpu.emulator import Emulator
from gp_emu_uqsa_tpu.sensitivity._core import Sensitivity


def setup(emul: Emulator, m, v) -> Sensitivity:
    """Build the Sensitivity engine from a trained Emulator."""
    if emul.state is None:
        raise RuntimeError("emulator must be trained before sensitivity setup")
    x, y, h = emul.train_view()
    beta = emul.fixed_beta if emul.fixed_beta is not None else None
    return Sensitivity(emul.state, x, emul.spec, m, v, beta=beta)


def sense_table(
    sens_list: Sequence[Sensitivity],
    input_names: Optional[Sequence[str]] = None,
    output_names: Optional[Sequence[str]] = None,
    save: Optional[str] = None,
):
    """Matplotlib table of sensitivity indices across emulators/outputs.

    Reference `sense_table(emuls, inputNames, outputNames)` (SURVEY.md S4.4).
    Returns the Figure.
    """
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    d = sens_list[0].d
    input_names = list(input_names) if input_names else [f"x{i}" for i in range(d)]
    output_names = (
        list(output_names) if output_names else [f"y{k}" for k in range(len(sens_list))]
    )
    rows = []
    for sens in sens_list:
        si = np.asarray(sens.sensitivity()["S_i"])
        rows.append([f"{v:.3f}" for v in si])
    fig, ax = plt.subplots(figsize=(1.5 + d, 1 + 0.5 * len(rows)))
    ax.axis("off")
    table = ax.table(
        cellText=rows,
        rowLabels=output_names,
        colLabels=input_names,
        loc="center",
        cellLoc="center",
    )
    table.scale(1, 1.4)
    ax.set_title("First-order sensitivity indices $S_i$")
    fig.tight_layout()
    if save:
        fig.savefig(save, dpi=120)
    return fig
