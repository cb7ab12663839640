package graft.model

/** The reference's 7 flat Avro event records as a Scala ADT
  * (cf. the 7 .avsc files in /root/reference/schemas — all fields are strings except
  * `age:int` and `list_price:float`; `timestamp` is a microsecond ISO-8601
  * string, /root/reference/UserEvents.py:14).
  *
  * Quirks preserved deliberately (SURVEY.md §8): the checkout event_name is
  * `"checkout_to_cart"` (not "checkout", /root/reference/UserEvents.py:150);
  * `preferred_language` includes the empty string
  * (/root/reference/UserEvents.py:66).
  */
sealed trait Event extends Product with Serializable {
  def timestamp: String
  def event_name: String
}

final case class SignIn(timestamp: String, event_name: String, user_id: String)
    extends Event

final case class SignOut(timestamp: String, event_name: String, user_id: String)
    extends Event

final case class ItemView(
    timestamp: String, event_name: String, user_id: String, item_id: String)
    extends Event

final case class AddedToCart(
    timestamp: String, event_name: String, user_id: String,
    item_id: String, cart_id: String)
    extends Event

final case class Checkout(
    timestamp: String, event_name: String, user_id: String,
    cart_id: String, payment_method: String)
    extends Event

final case class ConsumerRegistration(
    timestamp: String, event_name: String, user_id: String,
    age: Int, masked_email: String, preferred_language: String)
    extends Event

final case class MovieCatalogEnriched(
    timestamp: String, event_name: String, movie_id: String,
    title: String, genre: String, list_price: Float)
    extends Event

object Event {
  val SignInName = "sign_in"
  val SignOutName = "sign_out"
  val ItemViewName = "item_view"
  val AddedToCartName = "added_to_cart"
  /** NOT "checkout" — /root/reference/UserEvents.py:150. */
  val CheckoutName = "checkout_to_cart"
  val RegistrationName = "consumer_registration"
  val CatalogName = "movie_catalog_enriched"

  /** Kafka topic per event type (/root/reference/UserActivitySimulator.py:93-100). */
  val topics: Map[String, String] = Map(
    SignInName -> "sign_in_topic",
    SignOutName -> "sign_out_topic",
    ItemViewName -> "item_view_topic",
    AddedToCartName -> "added_to_cart_topic",
    CheckoutName -> "checkout_to_cart_topic",
    RegistrationName -> "consumer_registration_topic")
}
