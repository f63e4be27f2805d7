/* Reference-implementation benchmark anchor.
 *
 * Measures libpll-2 AVX2 CLV update throughput (site-updates/sec, where one
 * site-update = one operation x one alignment column over all rate
 * categories) on this host, to anchor bench.py's vs_baseline ratio
 * (BASELINE.md: "the benchmark phase must first build the C reference and
 * measure its AVX2 site-updates/sec").
 *
 * Usage: bench_ref <tips> <sites> <rate_cats> <reps>
 * Prints: one line "site_updates_per_sec <value>"
 */
#include "pll.h"
#include <stdio.h>
#include <stdlib.h>
#include <time.h>

static double now_sec(void)
{
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

int main(int argc, char **argv)
{
  unsigned int tips = argc > 1 ? (unsigned int)atoi(argv[1]) : 256;
  unsigned int sites = argc > 2 ? (unsigned int)atoi(argv[2]) : 65536;
  unsigned int rate_cats = argc > 3 ? (unsigned int)atoi(argv[3]) : 4;
  unsigned int reps = argc > 4 ? (unsigned int)atoi(argv[4]) : 5;
  unsigned int i, r;

  unsigned int inner = tips - 2;   /* unrooted binary, full traversal */
  unsigned int branches = 2 * tips - 3;

  pll_partition_t *part = pll_partition_create(
      tips, inner, 4, sites, 1, branches, rate_cats, inner,
      PLL_ATTRIB_ARCH_AVX2);
  if (!part)
  {
    fprintf(stderr, "partition_create failed: %s\n", pll_errmsg);
    return 1;
  }

  double freqs[4] = {0.25, 0.25, 0.25, 0.25};
  double subst[6] = {1, 2, 1, 1, 2, 1};
  double *rates = malloc(rate_cats * sizeof(double));
  pll_compute_gamma_cats(1.0, rate_cats, rates, PLL_GAMMA_RATES_MEAN);
  pll_set_frequencies(part, 0, freqs);
  pll_set_subst_params(part, 0, subst);
  pll_set_category_rates(part, rates);

  char *seq = malloc(sites + 1);
  const char bases[4] = {'A', 'C', 'G', 'T'};
  unsigned long state = 42;
  for (i = 0; i < tips; ++i)
  {
    unsigned int j;
    for (j = 0; j < sites; ++j)
    {
      state = state * 6364136223846793005UL + 1442695040888963407UL;
      seq[j] = bases[(state >> 33) & 3];
    }
    seq[sites] = 0;
    pll_set_tip_states(part, i, pll_map_nt, seq);
  }
  free(seq);

  unsigned int *mi = malloc(branches * sizeof(unsigned int));
  double *bl = malloc(branches * sizeof(double));
  unsigned int *pidx = malloc(rate_cats * sizeof(unsigned int));
  for (i = 0; i < branches; ++i) { mi[i] = i; bl[i] = 0.05 + 0.001 * i; }
  for (i = 0; i < rate_cats; ++i) pidx[i] = 0;
  pll_update_prob_matrices(part, pidx, mi, bl, branches);

  /* caterpillar operations: parent i combines previous inner (or tip) with
     the next tip; throughput is shape-independent */
  pll_operation_t *ops = malloc(inner * sizeof(pll_operation_t));
  for (i = 0; i < inner; ++i)
  {
    ops[i].parent_clv_index = tips + i;
    ops[i].parent_scaler_index = (int)i;
    ops[i].child1_clv_index = i == 0 ? 0 : tips + i - 1;
    ops[i].child1_scaler_index = i == 0 ? PLL_SCALE_BUFFER_NONE : (int)(i - 1);
    ops[i].child1_matrix_index = i == 0 ? 0 : tips + i - 1;
    ops[i].child2_clv_index = i + 1;
    ops[i].child2_scaler_index = PLL_SCALE_BUFFER_NONE;
    ops[i].child2_matrix_index = i + 1;
  }
  /* map matrix indices into the allocated range */
  for (i = 0; i < inner; ++i)
  {
    ops[i].child1_matrix_index %= branches;
    ops[i].child2_matrix_index %= branches;
  }

  /* warmup */
  pll_update_partials(part, ops, inner);

  double t0 = now_sec();
  for (r = 0; r < reps; ++r)
    pll_update_partials(part, ops, inner);
  double dt = now_sec() - t0;

  double updates = (double)inner * (double)sites * (double)reps;
  printf("site_updates_per_sec %.6g\n", updates / dt);
  printf("seconds_per_sweep %.6g\n", dt / reps);

  pll_partition_destroy(part);
  free(rates); free(mi); free(bl); free(pidx); free(ops);
  return 0;
}
