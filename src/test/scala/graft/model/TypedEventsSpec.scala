package graft.model

import graft.SparkSpec
import graft.gen.EventGen
import graft.streaming.EventDecode

class TypedEventsSpec extends SparkSpec {

  test("typed datasets project the decoded union by event type") {
    val gen = EventGen.batch(spark, 2000, seed = 21)
    val decoded = EventDecode.decode(EventGen.asJson(gen)).cache()

    val views: Long = TypedEvents.itemViews(decoded).count()
    val carts = TypedEvents.cartAdds(decoded).collect()
    val checkouts = TypedEvents.checkouts(decoded).collect()
    assert(views > 0 && carts.nonEmpty && checkouts.nonEmpty)
    // typed fields are populated per schema
    assert(carts.forall(c => c.cart_id != null && c.item_id != null))
    assert(checkouts.forall(c =>
      c.payment_method == "Cash" || c.payment_method == "Card"))
    assert(checkouts.forall(_.event_name == Event.CheckoutName))

    // registrations come from the generator frame (union schema drops
    // age/masked_email/preferred_language — reference quirk preserved)
    val regs = TypedEvents.registrations(gen).collect()
    assert(regs.nonEmpty)
    assert(regs.forall(r => r.age >= 18 && r.age <= 95))
    assert(regs.forall(r => Set("eng", "geo", "").contains(r.preferred_language)))
    decoded.unpersist()
  }
}
