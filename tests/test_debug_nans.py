"""RT_DEBUG_NANS=1 knob — the survey section-5 sanitizer row's
"optionally jax_debug_nans" clause. Subprocess tests: the knob acts at
package import, and jax_debug_nans is a process-level config."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_INJECT = (
    "import jax; jax.config.update('jax_platforms', 'cpu')\n"
    "import rsoderh_raytracing_tpu  # applies the knob\n"
    "import jax.numpy as jnp\n"
    "x = jax.jit(lambda v: jnp.log(v) * 0.0)(-1.0)  # log(-1) -> NaN\n"
    "print('value:', x)\n"
)


def _run(env_extra):
    return subprocess.run(
        [sys.executable, "-c", _INJECT],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, **env_extra},
    )


def test_trips_on_injected_nan():
    proc = _run({"RT_DEBUG_NANS": "1"})
    assert proc.returncode != 0
    assert "FloatingPointError" in proc.stderr or "nan" in proc.stderr.lower()


def test_off_by_default():
    proc = _run({"RT_DEBUG_NANS": ""})
    assert proc.returncode == 0, proc.stderr
    assert "value:" in proc.stdout
