/* Native reading-order kernel — a line-for-line transcription of the
 * numpy implementation in readingorder.py (itself pinned against
 * /root/reference/ocr/readingorder.py), built at first import by
 * operators/_native.py and loaded via ctypes with a transparent numpy
 * fallback.
 *
 * WHY: the greedy linearization evaluates O(n^2) tiny vector predicates
 * per page; at 8-40 lines per page the numpy ufunc DISPATCH cost (not
 * FLOPs) dominates the whole extraction kernel (profiled at ~70% of
 * ms/doc). Scalar C removes the dispatch entirely; the arithmetic is
 * bit-identical because every expression keeps the numpy version's exact
 * shape and the build forbids FP contraction (-ffp-contract=off — an FMA
 * would round once where numpy rounds twice).
 *
 * Semantics notes mirrored from the numpy code:
 *  - argmin ties resolve to the LOWEST index (scan with strict <);
 *  - a NaN value wins an argmin over non-NaN (np.argmin propagation:
 *    first NaN becomes and stays the minimum);
 *  - comparisons with NaN are false elsewhere, exactly like numpy's
 *    elementwise <.
 */

#include <math.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    int n;
    const double *x0, *y0, *x1, *y1; /* column views into the rect matrix */
    double *xm, *ym, *w, *h, *keys;
    unsigned char *excluded; /* scratch for current_column */
} page_t;

static inline int nb_before(const page_t *p, int i, int j) {
    /* needs_to_come_before(i, j) — readingorder.py:54-81 */
    const double xmi = p->xm[i], ymi = p->ym[i];
    const double xmj = p->xm[j], ymj = p->ym[j];
    if ((xmi < xmj && ymi <= ymj) || (xmi <= xmj && ymi < ymj)) return 1;
    if (xmi < p->x0[j] && (ymi < p->y1[j] || p->y0[i] < ymj)) return 1;
    if (ymi < p->y0[j] && (xmi < p->x1[j] || p->x0[i] < xmj)) return 1;
    return 0;
}

static inline double x_overlap(const page_t *p, int i, double cx0, double cx1) {
    double ov = (cx1 < p->x1[i] ? cx1 : p->x1[i]) -
                (cx0 > p->x0[i] ? cx0 : p->x0[i]);
    return ov > 0.0 ? ov : 0.0;
}

static inline int can_extend(const page_t *p, int i, double cx0, double cy0,
                             double cx1, double cy1, double toll) {
    /* ReadingOrderColumn.can_be_extended_by (readingorder.py:107-117),
     * exact expression shapes: (0.8*w < ov) | (0.9*col_w < ov),
     * ym > toll, (y0 - cy1) < (col_h + h). */
    const double ov = x_overlap(p, i, cx0, cx1);
    const double col_w = cx1 - cx0;
    const double col_h = cy1 - cy0;
    if (!((p->w[i] * 0.8) < ov || (col_w * 0.9) < ov)) return 0;
    if (!(p->ym[i] > toll)) return 0;
    if (!((p->y0[i] - cy1) < (p->h[i] + col_h))) return 0;
    return 1;
}

static inline int acc_extend(const page_t *p, int i, double cx0, double cy0,
                             double cx1, double cy1, double toll) {
    /* is_accurately_extended_by (readingorder.py:119-124):
     * can & (0.6*max(col_w, w) < ov) & (cy1 < y1). */
    if (!can_extend(p, i, cx0, cy0, cx1, cy1, toll)) return 0;
    const double ov = x_overlap(p, i, cx0, cx1);
    const double col_w = cx1 - cx0;
    const double mw = p->w[i] > col_w ? p->w[i] : col_w;
    if (!((mw * 0.6) < ov)) return 0;
    if (!(cy1 < p->y1[i])) return 0;
    return 1;
}

static inline int interrupts(const page_t *p, int i, double cx0, double cy0,
                             double cx1, double cy1, double bofl, double toll) {
    /* is_interrupted_by (readingorder.py:103-105). */
    return p->x0[i] < cx1 && cx0 < p->x1[i] && p->y0[i] < cy1 &&
           cy0 < p->y1[i] && p->ym[i] > bofl && p->ym[i] < toll;
}

/* argmin over mask with lowest-index ties and numpy NaN propagation
 * (first NaN wins); returns -1 when the mask is empty. */
static inline int masked_argmin(const double *vals, const unsigned char *mask,
                                int n) {
    int best = -1;
    double bv = 0.0;
    for (int i = 0; i < n; i++) {
        if (!mask[i]) continue;
        const double v = vals[i];
        if (best < 0) {
            best = i;
            bv = v;
        } else if (isnan(v) ? !isnan(bv) : v < bv) {
            best = i;
            bv = v;
        }
    }
    return best;
}

/* starting_line_for_next_block (readingorder.py:166-175 / _starting_line):
 * iterated min-by-sort-key restricted to must-precede predecessors. */
static int starting_line(const page_t *p, const unsigned char *remaining,
                         unsigned char *cand, int n) {
    memcpy(cand, remaining, (size_t)n);
    int selected = -1;
    for (;;) {
        const int sel = masked_argmin(p->keys, cand, n);
        if (sel < 0) break;
        selected = sel;
        cand[sel] = 0;
        int any = 0;
        for (int i = 0; i < n; i++) {
            if (cand[i] && nb_before(p, i, sel))
                any = 1;
            else
                cand[i] = 0;
        }
        if (!any) return selected;
    }
    return selected;
}

/* ReadingOrderColumn.current_column (readingorder.py:126-163 /
 * _current_column): walk reversed(preceding), adding each line to the
 * column until an interruption or a drop in the accurate-extender count;
 * identical comparisons to the numpy K-by-n matrix pass, evaluated
 * sequentially with early exit at the first violation. */
static void current_column(page_t *p, int current, const int *block,
                           int block_len, double out[6]) {
    const double ocx0 = p->x0[current], ocy0 = p->y0[current];
    const double ocx1 = p->x1[current], ocy1 = p->y1[current];
    const double obofl = p->y1[current], toll = p->y0[current];
    const int K = block_len - 1; /* preceding = block minus its last line */
    out[0] = ocx0; out[1] = ocy0; out[2] = ocx1; out[3] = ocy1;
    out[4] = obofl; out[5] = toll;
    if (K <= 0) return;

    const int n = p->n;
    unsigned char *excl = p->excluded;
    memset(excl, 0, (size_t)n);
    excl[current] = 1;

    /* acc_init over other = all lines except current, column = current */
    int prev_count = 0;
    for (int i = 0; i < n; i++)
        if (!excl[i] && acc_extend(p, i, ocx0, ocy0, ocx1, ocy1, toll))
            prev_count++;

    double cx0 = ocx0, cy0 = ocy0, cx1 = ocx1, cy1 = ocy1;
    /* column state after the previous accepted step (for the b-1 return) */
    double kx0 = ocx0, ky0 = ocy0, kx1 = ocx1, ky1 = ocy1, kbofl = obofl;
    int accepted = 0;

    for (int m = 0; m < K; m++) {
        const int e = block[K - 1 - m]; /* reversed(preceding)[m] */
        /* add_line_before: running union + the added line's bottom */
        if (p->x0[e] < cx0) cx0 = p->x0[e];
        if (p->y0[e] < cy0) cy0 = p->y0[e];
        if (p->x1[e] > cx1) cx1 = p->x1[e];
        if (p->y1[e] > cy1) cy1 = p->y1[e];
        const double bofl_m = p->y1[e];
        excl[e] = 1; /* other_k excludes walk[0..m] */

        int acc_count = 0, intr_any = 0;
        for (int i = 0; i < n; i++) {
            if (excl[i]) continue;
            if (!intr_any &&
                interrupts(p, i, cx0, cy0, cx1, cy1, bofl_m, toll))
                intr_any = 1;
            if (acc_extend(p, i, cx0, cy0, cx1, cy1, toll)) acc_count++;
        }
        if (intr_any || acc_count < prev_count) break; /* first violation */
        prev_count = acc_count;
        kx0 = cx0; ky0 = cy0; kx1 = cx1; ky1 = cy1; kbofl = bofl_m;
        accepted = 1;
    }
    if (accepted) {
        out[0] = kx0; out[1] = ky0; out[2] = kx1; out[3] = ky1;
        out[4] = kbofl; /* toll unchanged */
    }
}

/* sort_lines (readingorder.py:178-223 / sort_lines_indices).
 * rects: n*4 doubles, COLUMN arrays are derived internally.
 * out_lines: caller-allocated int[n] — emitted line indices in order.
 * out_offsets: caller-allocated int[n+1] — block k spans
 *   out_lines[out_offsets[k] .. out_offsets[k+1]).
 * Returns the number of blocks, or -1 on allocation failure. */
int sgs_sort_lines(const double *rects, int n, int *out_lines,
                   int *out_offsets) {
    if (n <= 0) {
        out_offsets[0] = 0;
        return 0;
    }
    /* one arena for every per-page array */
    double *dbuf = (double *)malloc(sizeof(double) * (size_t)n * 9);
    unsigned char *bbuf = (unsigned char *)malloc((size_t)n * 4);
    int *block = (int *)malloc(sizeof(int) * (size_t)n);
    if (!dbuf || !bbuf || !block) {
        free(dbuf); free(bbuf); free(block);
        return -1;
    }
    double *cx0 = dbuf, *cy0 = dbuf + n, *cx1 = dbuf + 2 * n,
           *cy1 = dbuf + 3 * n;
    page_t p;
    p.n = n;
    p.x0 = cx0; p.y0 = cy0; p.x1 = cx1; p.y1 = cy1;
    p.xm = dbuf + 4 * n; p.ym = dbuf + 5 * n;
    p.w = dbuf + 6 * n;  p.h = dbuf + 7 * n;
    p.keys = dbuf + 8 * n;
    p.excluded = bbuf + 3 * n;
    unsigned char *remaining = bbuf, *cand = bbuf + n, *scratch = bbuf + 2 * n;
    for (int i = 0; i < n; i++) {
        cx0[i] = rects[4 * i];
        cy0[i] = rects[4 * i + 1];
        cx1[i] = rects[4 * i + 2];
        cy1[i] = rects[4 * i + 3];
        p.xm[i] = (cx0[i] + cx1[i]) / 2.0;
        p.ym[i] = (cy0[i] + cy1[i]) / 2.0;
        p.w[i] = cx1[i] - cx0[i];
        p.h[i] = cy1[i] - cy0[i];
        p.keys[i] = cx0[i] + 2.0 * cy0[i];
        remaining[i] = 1;
    }

    int n_remaining = n, n_out = 0, n_blocks = 0;
    out_offsets[0] = 0;

    while (n_remaining) {
        int current = starting_line(&p, remaining, cand, n);
        remaining[current] = 0;
        n_remaining--;
        int blen = 0;
        block[blen++] = current;

        while (n_remaining) {
            int next = -1;
            double col[6];
            current_column(&p, current, block, blen, col);

            /* (i) lines that continue the current column */
            for (int i = 0; i < n; i++)
                cand[i] = remaining[i] &&
                          can_extend(&p, i, col[0], col[1], col[2], col[3],
                                     col[5]);
            const int highest = masked_argmin(p.y0, cand, n);
            if (highest >= 0) {
                for (int i = 0; i < n; i++)
                    scratch[i] = cand[i] && nb_before(&p, i, highest);
                scratch[highest] = 1;
                next = masked_argmin(p.x0, scratch, n);
            }

            /* (ii) nearest direct continuation within 20pt */
            if (next < 0) {
                for (int i = 0; i < n; i++) {
                    scratch[i] = 0;
                    if (!remaining[i]) continue;
                    const double dy = p.y0[i] - p.y1[current];
                    double d = hypot(p.x0[i] - p.x0[current], dy);
                    const double d2 = hypot(p.xm[i] - p.xm[current], dy);
                    if (d2 < d) d = d2;
                    const double d3 = hypot(p.x1[i] - p.x1[current], dy);
                    if (d3 < d) d = d3;
                    scratch[i] = d < 20.0;
                }
                next = masked_argmin(p.y0, scratch, n);
            }

            if (next < 0) break;

            current = next;
            remaining[current] = 0;
            n_remaining--;

            /* push-back close (readingorder.py:216-218) */
            if (n_remaining) {
                int any = 0;
                for (int i = 0; i < n && !any; i++)
                    if (remaining[i] && nb_before(&p, i, current)) any = 1;
                if (any) {
                    remaining[current] = 1;
                    n_remaining++;
                    break;
                }
            }
            block[blen++] = current;
        }

        for (int i = 0; i < blen; i++) out_lines[n_out++] = block[i];
        n_blocks++;
        out_offsets[n_blocks] = n_out;
    }

    free(dbuf);
    free(bbuf);
    free(block);
    return n_blocks;
}
