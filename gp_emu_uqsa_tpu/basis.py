"""Mean-function basis h(x) for universal kriging.

Reference parity: GP_emu_UQSA beliefs files specify the basis via
`basis_str` / `basis_inf` (constant `1.0` plus per-input linear terms `x[i]`,
see SURVEY.md S3 "Mean basis"). We support the same surface through
`BasisSpec`: a constant term plus an arbitrary subset of linear terms (the
reference's practically-used space), with `fix_mean` handled at the GP level
by an empty basis and a fixed beta offset.

The basis is a pure function X -> H usable under jit/vmap; the UQSA
closed-form integrals (sensitivity/) rely on the basis being at most linear,
which is also the MUCM requirement.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp


class BasisSpec(NamedTuple):
    """Constant-plus-linear mean basis.

    Attributes:
      include_const: include the constant 1.0 column (reference default).
      linear_dims: indices (into the *active-input* columns of X) that get a
        linear term, in order. Empty tuple => constant-only mean.
    """

    include_const: bool = True
    linear_dims: tuple[int, ...] = ()

    @property
    def q(self) -> int:
        return int(self.include_const) + len(self.linear_dims)


def linear_basis(d: int) -> BasisSpec:
    """The reference's default basis h(x) = [1, x_1, ..., x_d]."""
    return BasisSpec(True, tuple(range(d)))


def const_basis() -> BasisSpec:
    """h(x) = [1]."""
    return BasisSpec(True, ())


def basis_matrix(x: jnp.ndarray, spec: BasisSpec) -> jnp.ndarray:
    """H with rows h(x_i)^T, shape (n, q)."""
    cols = []
    if spec.include_const:
        cols.append(jnp.ones((x.shape[0], 1), dtype=x.dtype))
    if spec.linear_dims:
        cols.append(x[:, jnp.array(spec.linear_dims)])
    if not cols:
        return jnp.zeros((x.shape[0], 0), dtype=x.dtype)
    return jnp.concatenate(cols, axis=1)


def parse_basis_strings(basis_str: Sequence[str], basis_inf: Sequence[str]) -> BasisSpec:
    """Parse the reference beliefs-file basis description.

    `basis_str` like ["1.0", "x", "x"] and `basis_inf` like ["NA", "0", "1"]
    (the reference's format: a token per basis function, with basis_inf
    giving the input index or NA for the constant).
    """
    include_const = False
    linear: list[int] = []
    for fn, inf in zip(basis_str, basis_inf):
        token = fn.strip().lower()
        if token in ("1.0", "1", "const"):
            include_const = True
        elif token == "x" or (
            token.startswith("x[") and token.endswith("]")
        ):
            linear.append(int(inf))
        else:
            raise ValueError(
                f"unsupported basis function {fn!r}: only constant and linear "
                "terms are supported (the MUCM-analytic-UQSA-compatible set)"
            )
    return BasisSpec(include_const, tuple(linear))
