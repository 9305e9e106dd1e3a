"""Strong-field QED numerics: rates, spectra and cross sections.

Vectorized, shape-stable JAX implementations of the reference's QED
layer (reference: ``src/qed/``): quantum-synchrotron photon emission
(total rate + inverse-CDF spectrum sampling), one-photon absorption and
stimulated emission cross sections, the Airy function, and
piecewise-monotone cubic interpolation.
"""

from . import airy, emission, cross_sections, pwmci, tables_data  # noqa: F401
