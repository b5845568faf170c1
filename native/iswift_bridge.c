/* Dense-matrix ctypes bridge to the REFERENCE iSWIFT QP solver.
 *
 * Purpose: cross-validation ONLY (VERDICT r3 item 1).  This file is srbx's
 * own code; it links against the *unmodified* reference C sources at
 * /root/reference/optimization/iSWIFT/ (Prime.c, Auxilary.c, ldl/src/ldl.c,
 * src/timer.c), compiled out-of-tree into libiswift_ref.so, so that the
 * exact QP instances srbx assembles (NMPC + low-level) can be solved by the
 * solver the reference actually ships and diffed against srbx.ops.qp.
 *
 * Call semantics mirror the reference's Eigen wrapper
 * (optimization/iSWIFT/cpp_wrapper/iswift_qp.cpp:44-162): dense -> CCS
 * conversion dropping exact zeros, QP_SETUP / QP_SOLVE / QP_CLEANUP, copy
 * out the primal.  One deliberate difference: the wrapper permutes the KKT
 * matrix with Eigen's AMD ordering (iswift_qp.cpp:184-210) purely as a
 * fill-reducing ordering for the LDL factorization; the bridge passes the
 * identity permutation, which changes the factorization's fill pattern but
 * not the solution (problems here are n+m+p <= ~140, fill is irrelevant).
 */

#include <stdlib.h>
#include <string.h>

#include "Prime.h"

/* Count nonzeros of a dense row-major matrix. */
static idxint dense_nnz(const realqp *M, idxint rows, idxint cols) {
    idxint nnz = 0;
    for (idxint i = 0; i < rows * cols; i++)
        if (M[i] != 0.0) nnz++;
    return nnz;
}

/* Dense row-major (rows x cols) -> CCS (column-major, exact zeros dropped),
 * matching Eigen sparseView()+makeCompressed() as used by ccstorage()
 * (iswift_qp.cpp:164-182). Caller provides jc[cols+1], ir[nnz], pr[nnz]. */
static void dense_to_ccs(const realqp *M, idxint rows, idxint cols,
                         idxint *jc, idxint *ir, realqp *pr) {
    idxint k = 0;
    for (idxint j = 0; j < cols; j++) {
        jc[j] = k;
        for (idxint i = 0; i < rows; i++) {
            realqp v = M[i * cols + j];
            if (v != 0.0) {
                ir[k] = i;
                pr[k] = v;
                k++;
            }
        }
    }
    jc[cols] = k;
}

/* Solve min x'Px + c'x  s.t. Ax=b, Gx<=h with the reference solver.
 *
 * P: n*n, A: p*n, G: m*n — all dense row-major f64.  p may be 0 (A,b NULL).
 * Outputs: x_out[n] primal, y_out[p] eq duals (optional), z_out[m] ineq
 * duals (optional), iters_out (optional).
 * Returns the iSWIFT exit code (0 optimal, 1 kktfail, 2 maxit, 3 fatal),
 * or -1 on allocation failure. */
int iswift_solve_dense(int n, int m, int p,
                       const double *P, const double *c,
                       const double *A, const double *b,
                       const double *G, const double *h,
                       double sigma_d,
                       double *x_out, double *y_out, double *z_out,
                       int *iters_out) {
    idxint nnzP = dense_nnz(P, n, n);
    idxint nnzG = dense_nnz(G, m, n);
    idxint nnzA = (p > 0) ? dense_nnz(A, p, n) : 0;

    idxint *Pjc = malloc((n + 1) * sizeof(idxint));
    idxint *Pir = malloc((nnzP > 0 ? nnzP : 1) * sizeof(idxint));
    realqp *Ppr = malloc((nnzP > 0 ? nnzP : 1) * sizeof(realqp));
    idxint *Gjc = malloc((n + 1) * sizeof(idxint));
    idxint *Gir = malloc((nnzG > 0 ? nnzG : 1) * sizeof(idxint));
    realqp *Gpr = malloc((nnzG > 0 ? nnzG : 1) * sizeof(realqp));
    idxint *Ajc = NULL;
    idxint *Air = NULL;
    realqp *Apr = NULL;
    /* QP_SETUP stores these pointers in the QP struct; keep private copies
     * so the caller's buffers are never aliased by the solver. */
    realqp *cc = malloc(n * sizeof(realqp));
    realqp *hc = malloc((m > 0 ? m : 1) * sizeof(realqp));
    realqp *bc = (p > 0) ? malloc(p * sizeof(realqp)) : NULL;
    idxint *permut = malloc((n + m + p) * sizeof(idxint));

    if (!Pjc || !Pir || !Ppr || !Gjc || !Gir || !Gpr || !cc || !hc ||
        !permut || (p > 0 && !bc))
        return -1;

    dense_to_ccs(P, n, n, Pjc, Pir, Ppr);
    dense_to_ccs(G, m, n, Gjc, Gir, Gpr);
    memcpy(cc, c, n * sizeof(realqp));
    memcpy(hc, h, m * sizeof(realqp));
    if (p > 0) {
        Ajc = malloc((n + 1) * sizeof(idxint));
        Air = malloc((nnzA > 0 ? nnzA : 1) * sizeof(idxint));
        Apr = malloc((nnzA > 0 ? nnzA : 1) * sizeof(realqp));
        if (!Ajc || !Air || !Apr) return -1;
        dense_to_ccs(A, p, n, Ajc, Air, Apr);
        memcpy(bc, b, p * sizeof(realqp));
    }
    for (idxint i = 0; i < n + m + p; i++) permut[i] = i;

    QP *qp = QP_SETUP(n, m, p, Pjc, Pir, Ppr, Ajc, Air, Apr,
                      Gjc, Gir, Gpr, cc, hc, bc, sigma_d, permut);
    idxint code = QP_SOLVE(qp);

    memcpy(x_out, qp->x, n * sizeof(realqp));
    if (y_out && p > 0) memcpy(y_out, qp->y, p * sizeof(realqp));
    if (z_out) memcpy(z_out, qp->z, m * sizeof(realqp));
    if (iters_out) *iters_out = (int)qp->stats->IterationCount;

    QP_CLEANUP(qp);
    free(Pjc); free(Pir); free(Ppr);
    free(Gjc); free(Gir); free(Gpr);
    free(Ajc); free(Air); free(Apr);
    free(cc); free(hc); free(bc);
    free(permut);
    return (int)code;
}
