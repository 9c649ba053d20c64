"""Literal numpy transcription of the reference's *debug twin* CCSD routines.

These are deliberately naive loop/sum implementations mirroring
update_restricted_intermediates_debug (ccsd.f90:1314-1458) and
update_amplitudes_restricted_debug (ccsd.f90:1460-1536) line by line
(0-based indices).  They serve as the unit-test oracle for the production
einsum program in afesp_tpu.methods.ccsd_spatial.
"""

import numpy as np


def intermediates_debug(t1, t2, v):
    no, nv = t1.shape
    v_oovv, v_ovov, v_vvov, v_oovo, v_oooo, v_vvvv = (
        v["v_oovv"],
        v["v_ovov"],
        v["v_vvov"],
        v["v_oovo"],
        v["v_oooo"],
        v["v_vvvv"],
    )

    I_vo = np.zeros((nv, no))
    for i in range(no):
        for a in range(nv):
            I_vo[a, i] = np.sum((2 * v_oovv[:, i, :, a] - v_oovv[:, i, a, :]) * t1)

    c_oovv = t2 + np.einsum("ia,jb->ijab", t1, t1)

    I_vv = np.zeros((nv, nv))
    for a in range(nv):
        for b in range(nv):
            I_vv[b, a] = np.sum(
                (2 * v_vvov[:, b, :, a] - v_vvov[b, :, :, a]) * t1.T
            ) - np.sum((2 * v_oovv[:, :, :, b] - v_oovv[:, :, b, :]) * c_oovv[:, :, :, a])

    asym_t2 = 2 * t2 - t2.transpose(1, 0, 2, 3)

    I_oo_p = np.zeros((no, no))
    for i in range(no):
        for j in range(no):
            I_oo_p[j, i] = np.sum(
                (2 * v_oovo[:, i, :, j] - v_oovo[i, :, :, j]) * t1
            ) + np.sum(v_oovv[:, i, :, :] * asym_t2[:, j, :, :])

    I_oo = np.zeros((no, no))
    for i in range(no):
        for j in range(no):
            I_oo[j, i] = I_oo_p[j, i] + np.sum(I_vo[:, i] * t1[j, :])

    I_oooo = np.zeros((no,) * 4)
    for j in range(no):
        for i in range(no):
            for l in range(no):
                for k in range(no):
                    I_oooo[k, l, i, j] = (
                        v_oooo[k, l, i, j]
                        + np.sum(v_oovv[i, j] * c_oovv[k, l])
                        + np.sum(t1[k, :] * v_oovo[i, j, :, l])
                        + np.sum(t1[l, :] * v_oovo[j, i, :, k])
                    )

    I_vovv_p = np.zeros((nv, no, nv, nv))
    for b in range(nv):
        for a in range(nv):
            for i in range(no):
                for c in range(nv):
                    I_vovv_p[c, i, a, b] = (
                        v_vvov[b, a, i, c]
                        - np.sum(v_ovov[:, a, i, c] * t1[:, b])
                        - np.sum(t1[:, a] * v_oovv[:, i, c, b])
                    )

    I_ovov = np.zeros((no, nv, no, nv))
    for a in range(nv):
        for i in range(no):
            for b in range(nv):
                for j in range(no):
                    I_ovov[j, b, i, a] = (
                        v_ovov[j, b, i, a]
                        - 0.5 * np.sum(v_oovv[i, :, :, b] * c_oovv[j, :, :, a])
                        - np.sum(v_oovo[:, i, b, j] * t1[:, a])
                        + np.sum(v_vvov[:, b, i, a] * t1[j, :])
                    )

    I_voov = np.zeros((nv, no, no, nv))
    for a in range(nv):
        for i in range(no):
            for j in range(no):
                for b in range(nv):
                    I_voov[b, j, i, a] = (
                        v_oovv[i, j, b, a]
                        + np.sum(
                            (v_oovv[i, :, b, :] - 0.5 * v_oovv[i, :, :, b])
                            * t2[:, j, :, a]
                        )
                        - 0.5 * np.sum(v_oovv[:, i, :, b] * c_oovv[:, j, a, :])
                        + np.sum(v_vvov[b, :, i, a] * t1[j, :])
                        - np.sum(v_oovo[i, :, b, j] * t1[:, a])
                    )

    x_voov = np.zeros((nv, no, no, nv))
    for a in range(nv):
        for i in range(no):
            for j in range(no):
                for b in range(nv):
                    x_voov[b, j, i, a] = np.sum(v_vvov[b, :, i, a] * t1[j, :])

    I_ooov_p = np.zeros((no, no, no, nv))
    for a in range(nv):
        for i in range(no):
            for k in range(no):
                for j in range(no):
                    I_ooov_p[j, k, i, a] = (
                        v_oovo[k, j, a, i]
                        + np.sum(v_vvov[:, :, i, a] * t2[j, k, :, :])
                        + np.sum(t1[j, :] * x_voov[:, k, i, a])
                    )

    return dict(
        asym_t2=asym_t2,
        c_oovv=c_oovv,
        I_vo=I_vo,
        I_vv=I_vv,
        I_oo_p=I_oo_p,
        I_oo=I_oo,
        I_oooo=I_oooo,
        I_vovv_p=I_vovv_p,
        I_ovov=I_ovov,
        I_voov=I_voov,
        x_voov=x_voov,
        I_ooov_p=I_ooov_p,
    )


def amplitudes_debug(t1, t2, v, im, D_ia, D_ijab):
    no, nv = t1.shape
    v_oovv, v_ovov, v_vvov, v_oovo, v_oooo, v_vvvv = (
        v["v_oovv"],
        v["v_ovov"],
        v["v_vvov"],
        v["v_oovo"],
        v["v_oooo"],
        v["v_vvvv"],
    )
    I_vv, I_oo, I_vo, I_oo_p = im["I_vv"], im["I_oo"], im["I_vo"], im["I_oo_p"]
    I_oooo, I_ovov, I_voov = im["I_oooo"], im["I_ovov"], im["I_voov"]
    I_vovv_p, I_ooov_p, c_oovv = im["I_vovv_p"], im["I_ooov_p"], im["c_oovv"]

    tmp_t1 = np.zeros((no, nv))
    for a in range(nv):
        for i in range(no):
            tmp_t1[i, a] = (
                np.sum(I_vv[:, a] * t1[i, :])
                - np.sum(I_oo_p[i, :] * t1[:, a])
                + np.sum(I_vo.T * (2 * t2[:, i, :, a] - t2[i, :, :, a]))
                + np.sum(t1 * (2 * v_oovv[:, i, :, a] - v_ovov[:, a, i, :]))
                - np.sum(v_oovo[:, :, :, i] * (2 * t2[:, :, :, a] - t2[:, :, a, :]))
            )
            for m in range(no):
                tmp_t1[i, a] += np.sum(
                    v_vvov[:, :, m, a] * (2 * t2[m, i, :, :] - t2[i, m, :, :])
                )

    tmp_t2 = np.zeros((no, no, nv, nv))
    for b in range(nv):
        for a in range(nv):
            for j in range(no):
                for i in range(no):
                    tmp_t2[i, j, a, b] = (
                        np.sum(t2[i, j, a, :] * I_vv[:, b])
                        - np.sum(t2[i, :, a, b] * I_oo[j, :])
                        + 0.5 * np.sum(v_vvvv[:, :, a, b] * c_oovv[i, j, :, :])
                        + 0.5 * np.sum(c_oovv[:, :, a, b] * I_oooo[i, j, :, :])
                        + np.sum(t1[i, :] * I_vovv_p[:, j, a, b])
                        - np.sum(t1[:, a] * I_ooov_p[i, j, :, b])
                    )
                    for e in range(nv):
                        for m in range(no):
                            tmp_t2[i, j, a, b] += (
                                -t2[m, j, a, e] * I_ovov[i, e, m, b]
                                - I_ovov[i, e, m, a] * t2[m, j, e, b]
                                + (2 * t2[m, i, e, a] - t2[i, m, e, a])
                                * I_voov[e, j, m, b]
                            )

    tmp = np.zeros_like(tmp_t2)
    for b in range(nv):
        for a in range(nv):
            for j in range(no):
                for i in range(no):
                    tmp[i, j, a, b] = (
                        v_oovv[i, j, a, b] + tmp_t2[i, j, a, b] + tmp_t2[j, i, b, a]
                    )

    return tmp_t1 / D_ia, tmp / D_ijab
