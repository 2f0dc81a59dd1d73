"""Numpy port of diffusers' UniPCMultistepScheduler (flow-sigmas, predict_x0,
bh2, solver_order 2, lower_order_final) — the oracle for the JAX scan
implementation in fastdm_tpu/pipeline/schedulers.py.

Mirrors the reference control flow explicitly: python step loop, model-output
history lists, lower_order_nums ramp, this_order bookkeeping, corrector using
the previous step's order — the structure diffusers runs on the host and the
reference engine free-rides (ref: fastdm/model_entry.py:605-627).
"""

import numpy as np


def flow_unipc_sigmas(num_steps, shift=5.0, num_train_timesteps=1000):
    alphas = np.linspace(1.0, 1.0 / num_train_timesteps, num_steps + 1,
                         dtype=np.float64)
    s = 1.0 - alphas
    s = np.flip(shift * s / (1.0 + (shift - 1.0) * s))[:-1]
    return np.append(s, 0.0)


class UniPCOracle:
    """solver_order=2, predict_x0=True, solver_type='bh2',
    lower_order_final=True, disable_corrector=[], flow prediction."""

    def __init__(self, num_steps, shift=5.0):
        self.sigmas = flow_unipc_sigmas(num_steps, shift)
        self.num_steps = num_steps
        self.solver_order = 2
        self.model_outputs = [None, None]
        self.lower_order_nums = 0
        self.last_sample = None
        self.this_order = None
        self.step_index = 0

    @staticmethod
    def _alpha_sigma(s):
        return 1.0 - s, s

    def _lambda(self, s):
        a, sg = self._alpha_sigma(s)
        return np.log(a) - np.log(sg)

    def convert(self, model_output, sample):
        # flow_prediction + predict_x0: x0 = sample - sigma_t * v
        sigma = self.sigmas[self.step_index]
        return sample - sigma * model_output

    def _bh_coeffs(self, hh, order):
        h_phi_1 = np.expm1(hh)
        B_h = h_phi_1  # bh2
        b = []
        h_phi_k = h_phi_1 / hh - 1
        factorial_i = 1
        for i in range(1, order + 1):
            b.append(h_phi_k * factorial_i / B_h)
            factorial_i *= i + 1
            h_phi_k = h_phi_k / hh - 1 / factorial_i
        return h_phi_1, B_h, np.array(b)

    def uni_p(self, sample, order):
        m0 = self.model_outputs[-1]
        x = sample
        sigma_t, sigma_s0 = self.sigmas[self.step_index + 1], self.sigmas[self.step_index]
        alpha_t, _ = self._alpha_sigma(sigma_t)
        lam_t = self._lambda(sigma_t) if sigma_t > 0 else np.inf
        lam_s0 = self._lambda(sigma_s0)
        h = lam_t - lam_s0
        rks, D1s = [], []
        for i in range(1, order):
            si = self.step_index - i
            mi = self.model_outputs[-(i + 1)]
            lam_si = self._lambda(self.sigmas[si])
            rk = (lam_si - lam_s0) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        rks.append(1.0)
        hh = -h
        h_phi_1 = np.expm1(hh) if np.isfinite(hh) else -1.0
        B_h = h_phi_1
        x_t_ = (sigma_t / sigma_s0) * x - alpha_t * h_phi_1 * m0
        if D1s:
            # order 2 uses the simplified rhos_p = [0.5]
            assert order == 2
            pred_res = 0.5 * D1s[0]
            return x_t_ - alpha_t * B_h * pred_res
        return x_t_

    def uni_c(self, this_model_output, last_sample, this_sample, order):
        m0 = self.model_outputs[-1]
        x = last_sample
        sigma_t, sigma_s0 = self.sigmas[self.step_index], self.sigmas[self.step_index - 1]
        alpha_t, _ = self._alpha_sigma(sigma_t)
        lam_t, lam_s0 = self._lambda(sigma_t), self._lambda(sigma_s0)
        h = lam_t - lam_s0
        rks, D1s = [], []
        for i in range(1, order):
            si = self.step_index - (i + 1)
            mi = self.model_outputs[-(i + 1)]
            lam_si = self._lambda(self.sigmas[si])
            rk = (lam_si - lam_s0) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        rks.append(1.0)
        hh = -h
        h_phi_1, B_h, b = self._bh_coeffs(hh, order)
        x_t_ = (sigma_t / sigma_s0) * x - alpha_t * h_phi_1 * m0
        D1_t = this_model_output - m0
        if order == 1:
            rhos_c = np.array([0.5])
        else:
            R = np.stack([np.power(np.array(rks), i - 1) for i in range(1, order + 1)])
            rhos_c = np.linalg.solve(R, b)
        corr_res = sum(rhos_c[i] * D1s[i] for i in range(len(D1s)))
        return x_t_ - alpha_t * B_h * (corr_res + rhos_c[-1] * D1_t)

    def step(self, model_output, sample):
        use_corrector = self.step_index > 0 and self.last_sample is not None
        model_output_convert = self.convert(model_output, sample)
        if use_corrector:
            sample = self.uni_c(model_output_convert, self.last_sample, sample,
                                self.this_order)
        self.model_outputs = [self.model_outputs[1], model_output_convert]
        this_order = min(self.solver_order, self.num_steps - self.step_index)
        self.this_order = min(this_order, self.lower_order_nums + 1)
        self.last_sample = sample
        prev = self.uni_p(sample, self.this_order)
        if self.lower_order_nums < self.solver_order:
            self.lower_order_nums += 1
        self.step_index += 1
        return prev
