package graft.model

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed views over the decoded union frame — `Dataset[T]` with case-class
  * Encoders where type safety helps (the union DataFrame stays the dynamic
  * interchange form; these are the per-type projections a consumer codes
  * against). */
object TypedEvents {

  def signIns(decoded: DataFrame): Dataset[SignIn] = {
    import decoded.sparkSession.implicits._
    decoded.where(s"event_name = '${Event.SignInName}'")
      .selectExpr("timestamp", "event_name", "user_id")
      .as[SignIn]
  }

  def itemViews(decoded: DataFrame): Dataset[ItemView] = {
    import decoded.sparkSession.implicits._
    decoded.where(s"event_name = '${Event.ItemViewName}'")
      .selectExpr("timestamp", "event_name", "user_id", "item_id")
      .as[ItemView]
  }

  def cartAdds(decoded: DataFrame): Dataset[AddedToCart] = {
    import decoded.sparkSession.implicits._
    decoded.where(s"event_name = '${Event.AddedToCartName}'")
      .selectExpr("timestamp", "event_name", "user_id", "item_id", "cart_id")
      .as[AddedToCart]
  }

  def checkouts(decoded: DataFrame): Dataset[Checkout] = {
    import decoded.sparkSession.implicits._
    decoded.where(s"event_name = '${Event.CheckoutName}'")
      .selectExpr("timestamp", "event_name", "user_id", "cart_id", "payment_method")
      .as[Checkout]
  }

  /** Registrations from the *generator* frame (not the decoded union: the
    * reference's 9-field union schema deliberately omits age/masked_email/
    * preferred_language — spark_streaming_processor.py:27-36 — so those
    * fields are dropped at decode, a quirk we preserve). */
  def registrations(genFrame: DataFrame): Dataset[ConsumerRegistration] = {
    import genFrame.sparkSession.implicits._
    genFrame.where(s"event_name = '${Event.RegistrationName}'")
      .selectExpr("timestamp", "event_name", "user_id",
        "CAST(age AS INT) AS age", "masked_email", "preferred_language")
      .as[ConsumerRegistration]
  }
}
