/* C oracle: independent double-precision implementation of the pinned
 * gym_fishing dynamics (ORACLE_SEMANTICS.md).
 *
 * Purpose: (1) a second, independently-written reference implementation
 * cross-validated bit-for-bit against the NumPy oracle (two implementations
 * agreeing is much stronger evidence the pinned semantics are what we think
 * they are); (2) a fast host-side batch stepper for CPU-only consumers
 * (~100x the Python oracle's throughput).
 *
 * Injected-noise protocol: the caller supplies the N(0,1) streams, exactly
 * like oracle.step_xi, so trajectories are deterministic and comparable
 * across implementations. No RNG lives here.
 *
 * Built as a plain shared object (no Python.h); accessed via ctypes.
 */

#include <math.h>
#include <stdint.h>

enum Growth { LOGISTIC = 0, RICKER, BEVERTON_HOLT, ALLEN, MYERS, MAY };
enum Noise { ADDITIVE = 0, LOGNORMAL };
enum Scheme { CONTINUOUS = 0, PROPORTIONAL, RELATIVE };

/* params layout (doubles), matching gym_fishing_tpu.core.types.EnvParams:
 * 0:r 1:K 2:sigma 3:sigma_m 4:price 5:cost 6:init_state 7:init_harvest
 * 8:Tmax 9:action_scale 10:A 11:B 12:C 13:theta 14:a 15:b 16:q
 * 17:n_actions 18:collapse_penalty 19:r_drift */
#define P_R 0
#define P_K 1
#define P_SIGMA 2
#define P_SIGMA_M 3
#define P_PRICE 4
#define P_COST 5
#define P_INIT_STATE 6
#define P_INIT_HARVEST 7
#define P_TMAX 8
#define P_ACTION_SCALE 9
#define P_A 10
#define P_B 11
#define P_C 12
#define P_THETA 13
#define P_A_MAY 14
#define P_B_MAY 15
#define P_Q 16
#define P_N_ACTIONS 17
#define P_COLLAPSE_PENALTY 18
#define P_R_DRIFT 19
#define NPARAMS 20

static const double REL_MULT[3] = {1.0, 1.2, 0.8};

/* r is passed explicitly: the non-stationary variant drifts it per step
 * (r_eff = p[P_R] + p[P_R_DRIFT] * t). */
static double growth_fn(int growth, const double *p, double r, double x) {
  double K = p[P_K];
  switch (growth) {
    case LOGISTIC:
      return x + r * x * (1.0 - x / K);
    case RICKER:
      return x * exp(r * (1.0 - x / K));
    case BEVERTON_HOLT:
      return p[P_A] * x / (1.0 + p[P_B] * x);
    case ALLEN:
      return x * exp(r * (1.0 - x / K) * (x - p[P_C]) / K);
    case MYERS: {
      double xt = pow(x, p[P_THETA]);
      return r * xt / (1.0 + xt / K);
    }
    case MAY: {
      double xq = pow(x, p[P_Q]);
      return x + r * x * (1.0 - x / K) -
             p[P_A_MAY] * xq / (xq + pow(p[P_B_MAY], p[P_Q]));
    }
  }
  return x;
}

/* Roll one trajectory from (x0, h0, t0). Arrays are length T.
 * actions: continuous -> double in [-1,1]; discrete -> integer value stored
 * as double. Outputs written per step; `done` stops updating state but the
 * loop still fills remaining slots with the frozen state (caller slices).
 * Returns the number of steps until done (or T). */
int64_t oracle_rollout(
    const double *params, int growth, int noise_form, int scheme,
    double x0, double h0, int64_t t0,
    const double *actions, const double *xis, const double *etas, int64_t T,
    double *out_stock, double *out_obs, double *out_reward,
    uint8_t *out_done, double *out_harvest, double *out_quota) {
  double x = x0, h = h0;
  int64_t t = t0;
  int64_t steps = T;
  const double K = params[P_K];
  for (int64_t i = 0; i < T; i++) {
    /* decode */
    double quota;
    if (scheme == CONTINUOUS) {
      double a = actions[i];
      if (a < -1.0) a = -1.0;
      if (a > 1.0) a = 1.0;
      quota = (a + 1.0) * K * params[P_ACTION_SCALE];
    } else if (scheme == PROPORTIONAL) {
      quota = actions[i] / params[P_N_ACTIONS] * K;
    } else { /* RELATIVE */
      h = h * REL_MULT[(int)actions[i]];
      quota = h;
    }
    /* harvest, growth, noise */
    double hv = x < quota ? x : quota;
    double x1 = x - hv;
    double r_eff = params[P_R] + params[P_R_DRIFT] * (double)t;
    double mu = growth_fn(growth, params, r_eff, x1);
    double x2 = (noise_form == ADDITIVE) ? mu + params[P_SIGMA] * x1 * xis[i]
                                         : mu * exp(params[P_SIGMA] * xis[i]);
    double xn = x2 > 0.0 ? x2 : 0.0;
    double reward = params[P_PRICE] * hv - params[P_COST] * quota * quota;
    if (xn <= 0.0) reward -= params[P_COLLAPSE_PENALTY];
    t += 1;
    int done = (t >= (int64_t)params[P_TMAX]) || (xn <= 0.0);
    if (scheme != RELATIVE) h = hv;
    /* observe */
    double measured = params[P_SIGMA_M] > 0.0 ? xn * exp(params[P_SIGMA_M] * etas[i]) : xn;
    double obs = measured / K - 1.0;
    if (obs < -1.0) obs = -1.0;
    if (obs > 1.0) obs = 1.0;

    out_stock[i] = xn;
    out_obs[i] = obs;
    out_reward[i] = reward;
    out_done[i] = (uint8_t)done;
    out_harvest[i] = hv;
    out_quota[i] = quota;
    x = xn;
    if (done) {
      steps = i + 1;
      break;
    }
  }
  return steps;
}

/* Batched lockstep stepping: n independent instances advance one step.
 * State arrays (x, h, t) updated in place. */
void oracle_step_batch(
    const double *params, int growth, int noise_form, int scheme, int64_t n,
    double *x, double *h, int64_t *t,
    const double *actions, const double *xis, const double *etas,
    double *out_obs, double *out_reward, uint8_t *out_done) {
  const double K = params[P_K];
  for (int64_t i = 0; i < n; i++) {
    double quota;
    if (scheme == CONTINUOUS) {
      double a = actions[i];
      if (a < -1.0) a = -1.0;
      if (a > 1.0) a = 1.0;
      quota = (a + 1.0) * K * params[P_ACTION_SCALE];
    } else if (scheme == PROPORTIONAL) {
      quota = actions[i] / params[P_N_ACTIONS] * K;
    } else {
      h[i] = h[i] * REL_MULT[(int)actions[i]];
      quota = h[i];
    }
    double hv = x[i] < quota ? x[i] : quota;
    double x1 = x[i] - hv;
    double r_eff = params[P_R] + params[P_R_DRIFT] * (double)t[i];
    double mu = growth_fn(growth, params, r_eff, x1);
    double x2 = (noise_form == ADDITIVE) ? mu + params[P_SIGMA] * x1 * xis[i]
                                         : mu * exp(params[P_SIGMA] * xis[i]);
    double xn = x2 > 0.0 ? x2 : 0.0;
    out_reward[i] = params[P_PRICE] * hv - params[P_COST] * quota * quota
                    - (xn <= 0.0 ? params[P_COLLAPSE_PENALTY] : 0.0);
    t[i] += 1;
    out_done[i] = (uint8_t)((t[i] >= (int64_t)params[P_TMAX]) || (xn <= 0.0));
    if (scheme != RELATIVE) h[i] = hv;
    double measured = params[P_SIGMA_M] > 0.0 ? xn * exp(params[P_SIGMA_M] * etas[i]) : xn;
    double obs = measured / K - 1.0;
    if (obs < -1.0) obs = -1.0;
    if (obs > 1.0) obs = 1.0;
    out_obs[i] = obs;
    x[i] = xn;
  }
}
