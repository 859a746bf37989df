"""Library-wide error types.

TPU-native twin of the reference error enum
(/root/reference/crypto-primitives/src/lib.rs:46-71): the reference defines
`Error::{IncorrectInputLength, NotPrimeOrder, GenericError, SerializationError}`.
We map these onto a small exception hierarchy; verification APIs return
``False`` rather than raising, mirroring the reference's non-panicking
``Ok(false)`` style (src/merkle_tree/mod.rs:207-211).
"""


class CryptoError(Exception):
    """Base class for all framework errors."""


class IncorrectInputLength(CryptoError):
    def __init__(self, length: int):
        super().__init__(f"incorrect input length {length}")
        self.length = length


class NotPrimeOrder(CryptoError):
    def __init__(self):
        super().__init__("element is not prime order")


class SerializationError(CryptoError):
    pass
