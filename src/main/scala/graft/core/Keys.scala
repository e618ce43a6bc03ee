package graft.core

/** Default SipKey for the library's query surface (the reference's `SipKey`
  * analogue, reference `Internal.hs:126`). Any fixed key works; what matters
  * is that build and probe agree (enforced by the serialized key-hash check,
  * `BlockedBloom.fromBytes`). */
object Keys {
  val DefaultK0 = 0x5eedf00ddeadbeefL
  val DefaultK1 = 0x0123456789abcdefL
}
