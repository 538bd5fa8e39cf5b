"""Field and curve constants.

Values mirror the reference's scheme constants (reference:
porla/Utils/utils.h:26-44) plus the standard secp256k1 / BN254 curve
parameters (public domain parameters; base-field primes are needed here for
the point arithmetic the reference delegates to libsecp256k1/gnark).
"""

from __future__ import annotations

# --- FFT / erasure-code field (both schemes) -------------------------------
# p = 207 * 2^248 + 1, an FFT-friendly prime (utils.h:31)
FFT_PRIME = 207 * (1 << 248) + 1
assert FFT_PRIME == int(
    "93628759656736142393278101159368737990730026663232799828780155818898507169793")
# multiplicative generator of Z_p* used to derive roots of unity (utils.h:29)
FFT_GENERATOR = int(
    "37724658858582113439798596500054279666200959181261379108294206582568298678")

# --- secp256k1 (IPA scheme) ------------------------------------------------
SECP_P = 2**256 - 2**32 - 977                    # base field
SECP_N = int(                                    # group order (utils.h:27)
    "115792089237316195423570985008687907852837564279074904382605163141518161494337")
SECP_GX = int("79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798", 16)
SECP_GY = int("483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8", 16)
SECP_B = 7

# --- BN254 (KZG scheme) ----------------------------------------------------
BN254_P = int(
    "21888242871839275222246405745257275088696311157297823662689037894645226208583")
BN254_R = int(                                   # group order (utils.h:36)
    "21888242871839275222246405745257275088548364400416034343698204186575808495617")
BN254_B = 3
BN254_G1X = 1
BN254_G1Y = 2
# BN254 curve seed parameter (for the pairing Miller loop)
BN254_X = 4965661367192848881

# --- mixed-modulus data plane ---------------------------------------------
# LCM = p * q: data is kept reduced mod LCM during encoding (utils.h:33,42)
LCM_IPA = FFT_PRIME * SECP_N
LCM_KZG = FFT_PRIME * BN254_R
assert LCM_IPA == int(
    "108414696933520218734836842758930083921010314720502015005158615780106838862712"
    "38884283113399568804205471204971859923723932950084770981108620251449466962241")
assert LCM_KZG == int(
    "20493690311557075739372728100252440647103331181404088976909546514246649746202"
    "15782673575413484558574566298823256897068805013612518402283464943595715297281")


def group_order(scheme: str) -> int:
    return SECP_N if scheme == "ipa" else BN254_R


def lcm_modulus(scheme: str) -> int:
    return LCM_IPA if scheme == "ipa" else LCM_KZG
