"""One-shot generator for opal_tpu/qed/tables_data.py.

Parses the numeric lookup tables for the quantum synchrotron spectrum
out of the reference's data file (src/qed/photon_emission_tables.rs and
the two small tables embedded in src/qed/photon_emission.rs) and emits
them as numpy arrays.  These tables are precomputed physics data
(integrals of the synchrotron emission kernel) — data, not code.

Usage: python tools/extract_qed_tables.py /root/reference /root/repo/opal_tpu/qed/tables_data.py
"""

import re
import sys
from pathlib import Path

import numpy as np


def parse_cdf_blocks(text: str):
    """Parse 'CDF {coeff: X, power: Y, table: [ [a,b], ... ]}' blocks in order."""
    blocks = []
    pattern = re.compile(
        r"CDF\s*\{coeff:\s*([^,]+),\s*power:\s*([^,]+),\s*table:\s*\[(.*?)\]\s*\}",
        re.S,
    )
    for m in pattern.finditer(text):
        coeff = eval_rust_number(m.group(1))
        power = eval_rust_number(m.group(2))
        rows = re.findall(r"\[\s*([0-9eE+.\-]+)\s*,\s*([0-9eE+.\-]+)\s*\]", m.group(3))
        table = np.array([[float(a), float(b)] for a, b in rows], dtype=np.float64)
        assert table.shape == (31, 2), table.shape
        blocks.append((coeff, power, table))
    return blocks


def eval_rust_number(s: str) -> float:
    s = s.strip().rstrip(",")
    if "/" in s:
        num, den = s.split("/")
        return float(num) / float(den)
    return float(s)


def parse_pair_table(text: str, name: str, n: int) -> np.ndarray:
    m = re.search(name + r"[^=]*=\s*\[(.*?)\n\];", text, re.S)
    assert m, f"table {name} not found"
    rows = re.findall(r"\[\s*([0-9eE+.\-]+)\s*,\s*([0-9eE+.\-]+)\s*\]", m.group(1))
    table = np.array([[float(a), float(b)] for a, b in rows], dtype=np.float64)
    assert table.shape == (n, 2), (name, table.shape)
    return table


def main(ref_root: str, out_path: str) -> None:
    ref = Path(ref_root)
    tables_rs = (ref / "src/qed/photon_emission_tables.rs").read_text()
    emission_rs = (ref / "src/qed/photon_emission.rs").read_text()

    # Split the tables file into its three statics, in declaration order:
    # QUANTUM_CDF (41), Y_INFINITE_DELTA_CDF (1), Y_CDF (31).
    i_q = tables_rs.index("QUANTUM_CDF")
    i_yinf = tables_rs.index("Y_INFINITE_DELTA_CDF")
    i_y = tables_rs.index("pub static Y_CDF")
    quantum = parse_cdf_blocks(tables_rs[i_q:i_yinf])
    y_inf = parse_cdf_blocks(tables_rs[i_yinf:i_y])
    y_cdf = parse_cdf_blocks(tables_rs[i_y:])
    assert len(quantum) == 41, len(quantum)
    assert len(y_inf) == 1, len(y_inf)
    assert len(y_cdf) == 31, len(y_cdf)

    ln_h = parse_pair_table(emission_rs, "LN_H_CHI_TABLE", 41)
    classical = parse_pair_table(emission_rs, "CLASSICAL_SPECTRUM_TABLE", 41)

    def fmt_array(arr: np.ndarray) -> str:
        return np.array2string(
            arr, separator=", ", threshold=10**9, floatmode="unique"
        )

    q_coeff = np.array([b[0] for b in quantum])
    q_power = np.array([b[1] for b in quantum])
    q_table = np.stack([b[2] for b in quantum])
    y_coeff = np.array([b[0] for b in y_cdf])
    y_power = np.array([b[1] for b in y_cdf])
    y_table = np.stack([b[2] for b in y_cdf])

    out = f'''"""Lookup tables for the quantum/classical synchrotron spectrum.

GENERATED FILE (tools/extract_qed_tables.py) — numeric physics data
reproduced from the reference's precomputed tables
(src/qed/photon_emission_tables.rs, src/qed/photon_emission.rs).
Each CDF record is (coeff, power, table[31, 2]) describing a
low-end power-law continuation ``cdf(y) = coeff * y**power`` plus a
tabulated piecewise-monotone section.
"""

import numpy as np

LN_CHI_MIN = -4.60517018599  # ln(0.01)
LN_CHI_STEP = 0.230258509299  # ln(10)/10
LN_DELTA_MIN = -2.30258509299  # ln(0.1)
LN_DELTA_STEP = 0.230258509299  # ln(10)/10
DELTA_LN_CHI = 0.230258509299  # spacing of LN_H_CHI_TABLE

# Total-rate table: columns ln(chi), ln(h(chi)) for 0.01 <= chi <= 100.
LN_H_CHI_TABLE = np.array({fmt_array(ln_h)})

# Classical single-particle spectrum: columns ln(x), ln(cdf) for 0.02 <= x <= 20.
CLASSICAL_SPECTRUM_TABLE = np.array({fmt_array(classical)})

# Energy-sampling CDFs, one per tabulated chi (41 values, log-spaced).
QUANTUM_CDF_COEFF = np.array({fmt_array(q_coeff)})
QUANTUM_CDF_POWER = np.array({fmt_array(q_power)})
QUANTUM_CDF_TABLE = np.array({fmt_array(q_table)})

# Angle-sampling CDFs, one per tabulated delta (31 values, log-spaced).
Y_CDF_COEFF = np.array({fmt_array(y_coeff)})
Y_CDF_POWER = np.array({fmt_array(y_power)})
Y_CDF_TABLE = np.array({fmt_array(y_table)})

# Angle-sampling CDF in the delta -> infinity limit.
Y_INF_COEFF = {y_inf[0][0]!r}
Y_INF_POWER = {y_inf[0][1]!r}
Y_INF_TABLE = np.array({fmt_array(y_inf[0][2])})
'''
    Path(out_path).write_text(out)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
