"""Bit-faithful replica of commons-math3 3.6.1's SVD pseudoinverse solve.

The reference's exogenous loess path (LoessInterpolator.leastSquaresEstimation,
/root/reference/stl-decomp-4j/src/main/java/com/github/servicenow/ds/stats/stl/
LoessInterpolator.java:341-354) falls back to
``new SingularValueDecomposition(A).getSolver().solve(y)`` whenever the
threshold-0 QR throws ``SingularMatrixException`` — which on the step-exogenous
fixture happens for ~86% of trend windows (duplicate regressor columns).  The
fixture's expected values are the *output of that exact arithmetic*, and the
configuration is chaotic enough (15 robust outer loops) that a last-ulp
difference vs LAPACK's dgelsd grows to O(0.1) absolute error.  So we replicate
the commons-math arithmetic operation-for-operation in pure Python floats
(IEEE-754 binary64, identical to Java ``double``):

- the JAMA-derived one-sided Golub-Kahan bidiagonalization + implicit-shift QR
  iteration exactly as published in commons-math3 (Apache-2.0) /JAMA (public
  domain), including its FastMath.hypot (exponent-scaled sqrt) rather than the
  libm hypot;
- the pseudoinverse tolerance ``tol = max(m * s[0] * 2^-52, sqrt(SAFE_MIN))``;
- the Solver's exact op order: scale rows of U^T by 1/s_i (or 0), multiply
  V * (S+ U^T) with sequential inner-product accumulation, then operate(b).

Everything here is scalar Python-float math on tiny (window x 3ish) matrices;
it only runs on the degenerate-window fallback path, never in the bulk
STL hot loop.  Validated bitwise against the real commons-math 3.6.1 jar
(see tests/test_loess_components.py::test_commons_svd_bitwise_oracle).
"""

from __future__ import annotations

import math

_EPS = 2.0**-52
_TINY = 2.0**-966
_SAFE_MIN = 2.2250738585072014e-308  # Double.MIN_NORMAL, = Precision.SAFE_MIN


def _get_exponent(x: float) -> int:
    """Java Math.getExponent: unbiased exponent; -1023 for zero/subnormal."""
    if x == 0.0 or abs(x) < _SAFE_MIN:
        return -1023
    if math.isinf(x) or math.isnan(x):
        return 1024
    m, e = math.frexp(abs(x))  # m in [0.5, 1)
    return e - 1


def _hypot(x: float, y: float) -> float:
    """FastMath.hypot: exponent-midpoint scaling + sqrt(x*x + y*y)."""
    if math.isinf(x) or math.isinf(y):
        return math.inf
    if math.isnan(x) or math.isnan(y):
        return math.nan
    exp_x = _get_exponent(x)
    exp_y = _get_exponent(y)
    if exp_x > exp_y + 27:
        return abs(x)
    if exp_y > exp_x + 27:
        return abs(y)
    middle_exp = int((exp_x + exp_y) / 2)  # Java int division truncates
    scaled_x = math.ldexp(x, -middle_exp)
    scaled_y = math.ldexp(y, -middle_exp)
    scaled_h = math.sqrt(scaled_x * scaled_x + scaled_y * scaled_y)
    return math.ldexp(scaled_h, middle_exp)


def _decompose(A_in):
    """commons-math3 SingularValueDecomposition ctor on row-list-of-lists.

    Returns (U as m x n row lists, singular_values list[n], V as n x n,
    transposed flag, m, n)."""
    rows = len(A_in)
    cols = len(A_in[0])
    if rows < cols:
        transposed = True
        A = [[A_in[r][c] for r in range(rows)] for c in range(cols)]
        m, n = cols, rows
    else:
        transposed = False
        A = [row[:] for row in A_in]
        m, n = rows, cols

    s = [0.0] * n
    U = [[0.0] * n for _ in range(m)]
    V = [[0.0] * n for _ in range(n)]
    e = [0.0] * n
    work = [0.0] * m

    nct = min(m - 1, n)
    nrt = max(0, n - 2)
    for k in range(max(nct, nrt)):
        if k < nct:
            s[k] = 0.0
            for i in range(k, m):
                s[k] = _hypot(s[k], A[i][k])
            if s[k] != 0.0:
                if A[k][k] < 0.0:
                    s[k] = -s[k]
                for i in range(k, m):
                    A[i][k] /= s[k]
                A[k][k] += 1.0
            s[k] = -s[k]
        for j in range(k + 1, n):
            if k < nct and s[k] != 0.0:
                t = 0.0
                for i in range(k, m):
                    t += A[i][k] * A[i][j]
                t = -t / A[k][k]
                for i in range(k, m):
                    A[i][j] += t * A[i][k]
            e[j] = A[k][j]
        if k < nct:
            for i in range(k, m):
                U[i][k] = A[i][k]
        if k < nrt:
            e[k] = 0.0
            for i in range(k + 1, n):
                e[k] = _hypot(e[k], e[i])
            if e[k] != 0.0:
                if e[k + 1] < 0.0:
                    e[k] = -e[k]
                for i in range(k + 1, n):
                    e[i] /= e[k]
                e[k + 1] += 1.0
            e[k] = -e[k]
            if k + 1 < m and e[k] != 0.0:
                for i in range(k + 1, m):
                    work[i] = 0.0
                for j in range(k + 1, n):
                    for i in range(k + 1, m):
                        work[i] += e[j] * A[i][j]
                for j in range(k + 1, n):
                    t = -e[j] / e[k + 1]
                    for i in range(k + 1, m):
                        A[i][j] += t * work[i]
            for i in range(k + 1, n):
                V[i][k] = e[i]

    p = n
    if nct < n:
        s[nct] = A[nct][nct]
    if m < p:
        s[p - 1] = 0.0
    if nrt + 1 < p:
        e[nrt] = A[nrt][p - 1]
    e[p - 1] = 0.0

    # Generate U.
    for j in range(nct, n):
        for i in range(m):
            U[i][j] = 0.0
        U[j][j] = 1.0
    for k in range(nct - 1, -1, -1):
        if s[k] != 0.0:
            for j in range(k + 1, n):
                t = 0.0
                for i in range(k, m):
                    t += U[i][k] * U[i][j]
                t = -t / U[k][k]
                for i in range(k, m):
                    U[i][j] += t * U[i][k]
            for i in range(k, m):
                U[i][k] = -U[i][k]
            U[k][k] = 1.0 + U[k][k]
            for i in range(k - 1):
                U[i][k] = 0.0
        else:
            for i in range(m):
                U[i][k] = 0.0
            U[k][k] = 1.0

    # Generate V.
    for k in range(n - 1, -1, -1):
        if k < nrt and e[k] != 0.0:
            for j in range(k + 1, n):
                t = 0.0
                for i in range(k + 1, n):
                    t += V[i][k] * V[i][j]
                t = -t / V[k + 1][k]
                for i in range(k + 1, n):
                    V[i][j] += t * V[i][k]
        for i in range(n):
            V[i][k] = 0.0
        V[k][k] = 1.0

    # Main iteration loop for the singular values.
    pp = p - 1
    while p > 0:
        for k in range(p - 2, -1, -1):
            threshold = _TINY + _EPS * (abs(s[k]) + abs(s[k + 1]))
            if not (abs(e[k]) > threshold):
                e[k] = 0.0
                break
        else:
            k = -1

        if k == p - 2:
            kase = 4
        else:
            ks = p - 1
            while ks >= k:
                if ks == k:
                    break
                t = (abs(e[ks]) if ks != p else 0.0) + (
                    abs(e[ks - 1]) if ks != k + 1 else 0.0
                )
                if abs(s[ks]) <= _TINY + _EPS * t:
                    s[ks] = 0.0
                    break
                ks -= 1
            if ks == k:
                kase = 3
            elif ks == p - 1:
                kase = 1
            else:
                kase = 2
                k = ks
        k += 1

        if kase == 1:
            f = e[p - 2]
            e[p - 2] = 0.0
            for j in range(p - 2, k - 1, -1):
                t = _hypot(s[j], f)
                cs = s[j] / t
                sn = f / t
                s[j] = t
                if j != k:
                    f = -sn * e[j - 1]
                    e[j - 1] = cs * e[j - 1]
                for i in range(n):
                    t = cs * V[i][j] + sn * V[i][p - 1]
                    V[i][p - 1] = -sn * V[i][j] + cs * V[i][p - 1]
                    V[i][j] = t
        elif kase == 2:
            f = e[k - 1]
            e[k - 1] = 0.0
            for j in range(k, p):
                t = _hypot(s[j], f)
                cs = s[j] / t
                sn = f / t
                s[j] = t
                f = -sn * e[j]
                e[j] = cs * e[j]
                for i in range(m):
                    t = cs * U[i][j] + sn * U[i][k - 1]
                    U[i][k - 1] = -sn * U[i][j] + cs * U[i][k - 1]
                    U[i][j] = t
        elif kase == 3:
            max_pm1_pm2 = max(abs(s[p - 1]), abs(s[p - 2]))
            scale = max(max(max(max_pm1_pm2, abs(e[p - 2])), abs(s[k])), abs(e[k]))
            sp = s[p - 1] / scale
            spm1 = s[p - 2] / scale
            epm1 = e[p - 2] / scale
            sk = s[k] / scale
            ek = e[k] / scale
            b = ((spm1 + sp) * (spm1 - sp) + epm1 * epm1) / 2.0
            c = (sp * epm1) * (sp * epm1)
            shift = 0.0
            if b != 0.0 or c != 0.0:
                shift = math.sqrt(b * b + c)
                if b < 0.0:
                    shift = -shift
                shift = c / (b + shift)
            f = (sk + sp) * (sk - sp) + shift
            g = sk * ek
            for j in range(k, p - 1):
                t = _hypot(f, g)
                cs = f / t
                sn = g / t
                if j != k:
                    e[j - 1] = t
                f = cs * s[j] + sn * e[j]
                e[j] = cs * e[j] - sn * s[j]
                g = sn * s[j + 1]
                s[j + 1] = cs * s[j + 1]
                for i in range(n):
                    t = cs * V[i][j] + sn * V[i][j + 1]
                    V[i][j + 1] = -sn * V[i][j] + cs * V[i][j + 1]
                    V[i][j] = t
                t = _hypot(f, g)
                cs = f / t
                sn = g / t
                s[j] = t
                f = cs * e[j] + sn * s[j + 1]
                s[j + 1] = -sn * e[j] + cs * s[j + 1]
                g = sn * e[j + 1]
                e[j + 1] = cs * e[j + 1]
                if j < m - 1:
                    for i in range(m):
                        t = cs * U[i][j] + sn * U[i][j + 1]
                        U[i][j + 1] = -sn * U[i][j] + cs * U[i][j + 1]
                        U[i][j] = t
            e[p - 2] = f
        else:  # kase == 4: convergence
            if s[k] <= 0.0:
                s[k] = -s[k] if s[k] < 0.0 else 0.0
                for i in range(pp + 1):
                    V[i][k] = -V[i][k]
            while k < pp:
                if s[k] >= s[k + 1]:
                    break
                t = s[k]
                s[k] = s[k + 1]
                s[k + 1] = t
                if k < n - 1:
                    for i in range(n):
                        t = V[i][k + 1]
                        V[i][k + 1] = V[i][k]
                        V[i][k] = t
                if k < m - 1:
                    for i in range(m):
                        t = U[i][k + 1]
                        U[i][k + 1] = U[i][k]
                        U[i][k] = t
                k += 1
            p -= 1

    return U, s, V, transposed, m, n


def svd_solve(A, y):
    """``new SingularValueDecomposition(A).getSolver().solve(y)``.

    A: sequence of m rows (each n floats); y: m floats.  Returns list[n].
    """
    A = [[float(v) for v in row] for row in A]
    y = [float(v) for v in y]
    U, s, V, transposed, m, n = _decompose(A)
    # In the transposed case the public U is the internal V and vice versa.
    pubU = V if transposed else U  # rows x n
    pubV = U if transposed else V  # cols x n
    tol = max(m * s[0] * _EPS, math.sqrt(_SAFE_MIN))

    # Solver ctor: suT = U^T (n x rows(A)); scale row i by 1/s_i (or 0).
    n_rows_u = len(pubU)
    suT = [[pubU[j][i] for j in range(n_rows_u)] for i in range(len(pubU[0]))]
    for i in range(len(s)):
        a = 1.0 / s[i] if s[i] > tol else 0.0
        row = suT[i]
        for j in range(len(row)):
            row[j] *= a
    # pseudoInverse = V * suT, sequential-sum matrix multiply.
    n_out = len(pubV)
    pinv = [[0.0] * n_rows_u for _ in range(n_out)]
    for r in range(n_out):
        vrow = pubV[r]
        for c in range(n_rows_u):
            acc = 0.0
            for i in range(len(suT)):
                acc += vrow[i] * suT[i][c]
            pinv[r][c] = acc
    # solve = pseudoInverse.operate(b), sequential sum.
    out = [0.0] * n_out
    for r in range(n_out):
        acc = 0.0
        prow = pinv[r]
        for i in range(len(y)):
            acc += prow[i] * y[i]
        out[r] = acc
    return out
