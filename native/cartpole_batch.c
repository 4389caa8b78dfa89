/* Vectorized CartPole dynamics in C — the native-simulator analog for this
 * framework's host-loop driver (the reference integrates CUDA-hosted sims;
 * here a C batch stepper demonstrates the same native-env integration path).
 *
 * Physics follows the classic Barto-Sutton-Anderson cart-pole formulation
 * (the same system gymnasium's CartPole-v1 simulates).
 *
 * Build: gcc -O3 -shared -fPIC -o libcartpole_batch.so cartpole_batch.c -lm
 */

#include <math.h>
#include <stdint.h>
#include <stdlib.h>

#define GRAVITY 9.8
#define CART_MASS 1.0
#define POLE_MASS 0.1
#define TOTAL_MASS (CART_MASS + POLE_MASS)
#define POLE_HALF_LENGTH 0.5
#define POLE_MASS_LENGTH (POLE_MASS * POLE_HALF_LENGTH)
#define FORCE_MAG 10.0
#define TAU 0.02
#define X_THRESHOLD 2.4
#define THETA_THRESHOLD (12.0 * 2.0 * M_PI / 360.0)
#define MAX_EPISODE_STEPS 500

/* xorshift PRNG per call site; caller provides and updates the seed. */
static inline double urand(uint64_t *s) {
    uint64_t x = *s;
    x ^= x << 13;
    x ^= x >> 7;
    x ^= x << 17;
    *s = x;
    return (double)(x >> 11) * (1.0 / 9007199254740992.0);
}

/* state layout: [n][4] = x, x_dot, theta, theta_dot; steps: [n] */
void cartpole_reset(double *state, int32_t *steps, int32_t n, const int32_t *indices,
                    int32_t num_indices, uint64_t *seed) {
    for (int32_t k = 0; k < num_indices; ++k) {
        int32_t i = indices ? indices[k] : k;
        for (int32_t j = 0; j < 4; ++j) {
            state[i * 4 + j] = (urand(seed) - 0.5) * 0.1; /* U(-0.05, 0.05) */
        }
        steps[i] = 0;
    }
}

/* actions: [n] in {0, 1}; outputs: reward [n], terminated [n], truncated [n] */
void cartpole_step(double *state, int32_t *steps, int32_t n, const int32_t *actions,
                   double *reward, uint8_t *terminated, uint8_t *truncated) {
    for (int32_t i = 0; i < n; ++i) {
        double x = state[i * 4 + 0];
        double x_dot = state[i * 4 + 1];
        double theta = state[i * 4 + 2];
        double theta_dot = state[i * 4 + 3];

        double force = actions[i] ? FORCE_MAG : -FORCE_MAG;
        double cos_t = cos(theta);
        double sin_t = sin(theta);

        double temp = (force + POLE_MASS_LENGTH * theta_dot * theta_dot * sin_t) / TOTAL_MASS;
        double theta_acc = (GRAVITY * sin_t - cos_t * temp) /
                           (POLE_HALF_LENGTH * (4.0 / 3.0 - POLE_MASS * cos_t * cos_t / TOTAL_MASS));
        double x_acc = temp - POLE_MASS_LENGTH * theta_acc * cos_t / TOTAL_MASS;

        x += TAU * x_dot;
        x_dot += TAU * x_acc;
        theta += TAU * theta_dot;
        theta_dot += TAU * theta_acc;

        state[i * 4 + 0] = x;
        state[i * 4 + 1] = x_dot;
        state[i * 4 + 2] = theta;
        state[i * 4 + 3] = theta_dot;
        steps[i] += 1;

        int term = (x < -X_THRESHOLD) || (x > X_THRESHOLD) ||
                   (theta < -THETA_THRESHOLD) || (theta > THETA_THRESHOLD);
        int trunc = steps[i] >= MAX_EPISODE_STEPS;
        reward[i] = 1.0;
        terminated[i] = (uint8_t)term;
        truncated[i] = (uint8_t)(trunc && !term);
    }
}
